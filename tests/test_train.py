"""End-to-end trainer tests: the minimum slice (rigid_insertion + HEPi + TRPL)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent


@pytest.fixture(scope="module")
def trainer():
    return build_agent(
        task="rigid_insertion",
        model="hepi",
        num_envs=4,
        algo="trpl",
        latent_dim=16,
        num_ori=4,
        train_cfg=TrainConfig(algo="trpl", steps_per_batch=8, ppo_epochs=2, mini_batch_size=16),
        env_kwargs={"warmup_steps": 0, "episode_length": 8},
    )


def test_init(trainer):
    state = trainer.init(jax.random.PRNGKey(0))
    assert state.num_updates == 0
    leaves = jax.tree_util.tree_leaves(state.actor_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_train_iteration_runs(trainer):
    state = trainer.init(jax.random.PRNGKey(0))
    state, metrics = trainer.train_iteration(state)
    for k, v in metrics.items():
        if k == "train/reward":
            continue  # NaN when no episode finished
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.num_updates) == 2 * trainer.num_minibatches
    # TRPL constraint metrics present and within bounds vs the projection
    assert float(metrics["mean_constraint"]) <= 0.05 * 1.1
    assert "loss_trust_region" in metrics


def test_train_changes_params(trainer):
    state = trainer.init(jax.random.PRNGKey(1))
    p0 = jax.tree_util.tree_leaves(state.actor_params)
    state, _ = trainer.train_iteration(state)
    p1 = jax.tree_util.tree_leaves(state.actor_params)
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(p0, p1)]
    assert max(diffs) > 0


def test_norm_stats_update(trainer):
    state = trainer.init(jax.random.PRNGKey(2))
    assert float(state.norm.position.count) == 0
    state, _ = trainer.train_iteration(state)
    assert float(state.norm.position.count) > 0


def test_episode_reward_logged(trainer):
    state = trainer.init(jax.random.PRNGKey(3))
    state, metrics = trainer.train_iteration(state)  # episode_length=8 = steps_per_batch
    assert float(metrics["train/episodes"]) > 0
    assert np.isfinite(float(metrics["train/reward"]))


def test_eval_rollout(trainer):
    state = trainer.init(jax.random.PRNGKey(4))
    ret = trainer.eval_rollout(state, n_steps=16)
    assert np.isfinite(float(ret))


def test_ppo_algo_variant():
    t = build_agent(
        task="rigid_pushing",
        model="transformer",
        num_envs=4,
        algo="ppo",
        latent_dim=16,
        train_cfg=TrainConfig(algo="ppo", steps_per_batch=4, ppo_epochs=1, mini_batch_size=8),
        env_kwargs={"episode_length": 8},
    )
    state = t.init(jax.random.PRNGKey(0))
    state, metrics = t.train_iteration(state)
    assert "clip_fraction" in metrics
    assert np.isfinite(float(metrics["loss_objective"]))


def test_kl_ppo_algo_variant():
    """algo=kl_ppo (adaptive KL-penalty PPO, configs/algorithm/kl_ppo.yaml):
    trains one iteration, carries the adapting beta in TrainState."""
    t = build_agent(
        task="rigid_pushing",
        model="transformer",
        num_envs=4,
        algo="kl_ppo",
        latent_dim=16,
        train_cfg=TrainConfig(algo="kl_ppo", steps_per_batch=4, ppo_epochs=2, mini_batch_size=8),
        env_kwargs={"episode_length": 8},
    )
    state = t.init(jax.random.PRNGKey(0))
    assert float(state.kl_beta) == 1.0
    state, metrics = t.train_iteration(state)
    assert np.isfinite(float(metrics["loss_objective"]))
    assert np.isfinite(float(metrics["kl"]))
    assert float(state.kl_beta) > 0  # adapted (or unchanged), still positive
    # second iteration reuses the carried beta without retracing issues
    state, metrics = t.train_iteration(state)
    assert np.isfinite(float(metrics["kl_penalty_beta"]))


def test_kl_ppo_beta_interval_iteration():
    """kl_beta_interval="iteration" (Schulman 2017 semantics): beta is a
    constant of the update phase — every minibatch sees the SAME beta — and
    adapts at most one increment/decrement factor per train_iteration, from
    the phase-final KL. Contrast: the per-minibatch torchrl controller can
    move beta by 2^(epochs*minibatches) within one iteration, the measured
    relaxation-oscillator driver of the flagship plateau
    (docs/KL_PPO_NOTES.md)."""
    t = build_agent(
        task="rigid_pushing",
        model="transformer",
        num_envs=4,
        algo="kl_ppo",
        latent_dim=16,
        train_cfg=TrainConfig(
            algo="kl_ppo",
            steps_per_batch=4,
            ppo_epochs=2,
            mini_batch_size=8,
            kl_beta_interval="iteration",
        ),
        env_kwargs={"episode_length": 8},
    )
    state = t.init(jax.random.PRNGKey(0))
    b0 = float(state.kl_beta)
    state, metrics = t.train_iteration(state)
    b1 = float(state.kl_beta)
    # logged beta (mean over minibatches) == beta max == the constant b0
    assert float(metrics["kl_penalty_beta"]) == pytest.approx(b0)
    assert float(metrics["kl_penalty_beta_max"]) == pytest.approx(b0)
    # one adapt step: the new beta is b0 * one factor from {increment, 1, decrement}
    assert any(
        b1 == pytest.approx(max(min(b0 * f, 1e6), 1e-2)) for f in (2.0, 1.0, 0.5)
    )
    # second iteration: carried beta is the adapted one, still a phase constant
    state, metrics = t.train_iteration(state)
    assert float(metrics["kl_penalty_beta"]) == pytest.approx(b1)


@pytest.mark.parametrize("task,model", [("rigid_sliding", "hepi"), ("rigid_insertion_two_agents", "hepi"), ("rope_shaping", "hepi"), ("rigid_insertion", "empn"), ("rigid_insertion", "gcn"), ("rigid_insertion", "meshgraphnet"), ("rigid_pushing", "mlp"), ("cloth_hanging", "mlp")])
def test_all_tasks_and_models_train(task, model):
    """Every registered task x a spread of models completes a TRPL iteration."""
    kwargs = {"episode_length": 4}
    if task.startswith("rigid"):
        kwargs["warmup_steps"] = 0
    if task == "rope_shaping":
        kwargs.update({"num_links": 10, "rope_length": 1.25})
    t = build_agent(
        task=task,
        model=model,
        num_envs=2,
        algo="trpl",
        latent_dim=16,
        num_ori=4,
        train_cfg=TrainConfig(algo="trpl", steps_per_batch=4, ppo_epochs=1, mini_batch_size=8),
        env_kwargs=kwargs,
    )
    state = t.init(jax.random.PRNGKey(0))
    state, metrics = t.train_iteration(state)
    assert np.isfinite(float(metrics["loss_objective"])), (task, model)
    assert np.isfinite(float(metrics["loss_critic"])), (task, model)


def test_eval_success(trainer):
    state = trainer.init(jax.random.PRNGKey(5))
    out = trainer.eval_success(state, n_steps=16, threshold=5.0)
    # threshold 5.0 -> everything counts as success
    assert float(out["success_rate"]) == 1.0
    assert np.isfinite(float(out["mean_final_distance"]))


def test_training_noise_augmentation():
    """training_noise perturbs training forwards (pyg_data/utils.noise_like):
    the same minibatch yields different losses at different update counters,
    and the iteration still runs finite end to end."""
    t = build_agent(
        task="rigid_insertion",
        model="hepi",
        num_envs=2,
        algo="trpl",
        latent_dim=16,
        num_ori=4,
        train_cfg=TrainConfig(algo="trpl", steps_per_batch=4, ppo_epochs=1, mini_batch_size=8),
        env_kwargs={"warmup_steps": 0, "episode_length": 4},
        training_noise=True,
        training_noise_std=0.05,
    )
    assert t.policy_builder.training_noise and t.critic_builder.training_noise
    state = t.init(jax.random.PRNGKey(0))
    state, batch, _ = t._collect(state)

    T, B = 4, 2
    flat = lambda x: x.reshape((T * B,) + x.shape[2:])
    mb = {
        "tobs": jax.tree_util.tree_map(flat, batch.tobs),
        "action": flat(batch.action),
        "log_prob": flat(batch.log_prob),
        "mean": flat(batch.mean),
        "std": flat(batch.std),
        "value": flat(batch.value),
        "advantage": jnp.ones(T * B),
        "value_target": jnp.zeros(T * B),
        "env_ids": jnp.tile(jnp.arange(B, dtype=jnp.int32), T),
    }
    l0, _ = t._minibatch_loss(state.actor_params, state.critic_params, mb, jnp.asarray(0))
    l0b, _ = t._minibatch_loss(state.actor_params, state.critic_params, mb, jnp.asarray(0))
    l1, _ = t._minibatch_loss(state.actor_params, state.critic_params, mb, jnp.asarray(1))
    assert float(l0) == float(l0b)  # deterministic given the update counter
    assert float(l0) != float(l1)  # noise redrawn per update
    state, metrics = t.train_iteration(state)
    assert np.isfinite(float(metrics["loss_objective"]))


def test_entropy_schedule_end_to_end():
    """Entropy schedule (base_projection_layer exp schedule): the projected
    dist's entropy is pushed toward the schedule bound; trainer init records
    the first-batch policy entropy (initial_entropy e0) and training runs."""
    t = build_agent(
        task="rigid_insertion",
        model="hepi",
        num_envs=2,
        algo="trpl",
        latent_dim=16,
        num_ori=4,
        train_cfg=TrainConfig(algo="trpl", steps_per_batch=4, ppo_epochs=1, mini_batch_size=8, total_iterations=2),
        env_kwargs={"warmup_steps": 0, "episode_length": 4},
        entropy_schedule="exp",
        target_entropy=-2.0,
        temperature=0.5,
    )
    assert t.projection.entropy_schedule_type == "exp"
    assert t.projection.total_train_steps == 2 * 1 * 1  # iters x epochs x minibatches
    assert t.projection.action_dim == t.env.cfg.action_dim
    state = t.init(jax.random.PRNGKey(0))
    assert np.isfinite(float(state.initial_entropy))
    state, metrics = t.train_iteration(state)
    assert np.isfinite(float(metrics["loss_objective"]))
    assert np.isfinite(float(metrics["entropy"]))

    # at step = total_train_steps the exp schedule reaches dim * target
    from geometry_rl_tpu.rl import gaussian as G
    from geometry_rl_tpu.rl.projections.base import entropy_equality_projection

    bound = t.projection.entropy_bound(
        jnp.asarray(t.projection.total_train_steps), state.initial_entropy, jnp.float32
    )
    dim_tgt = t.env.cfg.action_dim * -2.0
    expected = dim_tgt + (float(state.initial_entropy) - dim_tgt) * 0.5**10
    assert np.isclose(float(bound), expected, rtol=1e-5)
    d = G.DiagGaussian(jnp.zeros((3, t.env.cfg.action_dim)), jnp.ones((3, t.env.cfg.action_dim)))
    proj = entropy_equality_projection(d, bound)
    assert np.allclose(np.asarray(G.entropy(proj)), float(bound), rtol=1e-4)


def test_papi_steps_trainer_integration():
    """cfg.papi_steps workflow: backtracking runs inside the jitted iteration
    (papi_projection.py:151-245) and keeps metrics finite."""
    from geometry_rl_tpu.train.builders import build_agent
    from geometry_rl_tpu.train.ppo import TrainConfig

    cfg = TrainConfig(
        algo="trpl", steps_per_batch=8, ppo_epochs=2, mini_batch_size=16,
        papi_steps=True, papi_history=4, papi_iters=5,
    )
    trainer = build_agent(
        task="rigid_pushing", model="mlp", num_envs=4, algo="trpl",
        latent_dim=8, proj_type="papi", mean_bound=0.05, cov_bound=0.005,
        train_cfg=cfg, env_kwargs={"episode_length": 4, "warmup_steps": 0},
        contextual_std=False,
    )
    state = trainer.init(jax.random.PRNGKey(0))
    papi_state = trainer.papi_init(state)
    state, papi_state, metrics = trainer.train_iteration_papi(state, papi_state)
    assert np.isfinite(float(metrics["loss_objective"]))
    assert np.isfinite(float(metrics["papi/n_backtracks"]))
    assert 0.0 < float(metrics["papi/lr_scale"]) <= 1.0
    # second iteration reuses the carried history
    state, papi_state, metrics = trainer.train_iteration_papi(state, papi_state)
    assert np.isfinite(float(metrics["train/reward"]))


def test_entropy_equality_control_pins_training_entropy():
    """entropy_eq + exp schedule (the TRPL entropy-control mode used to
    stabilize post-convergence entropy inflation): the PROJECTED policy
    entropy reported by training must track the schedule bound, preventing
    the entropy bonus from inflating std indefinitely."""
    t = build_agent(
        task="rigid_insertion",
        model="hepi",
        num_envs=2,
        algo="trpl",
        latent_dim=16,
        num_ori=4,
        train_cfg=TrainConfig(
            algo="trpl", steps_per_batch=4, ppo_epochs=1, mini_batch_size=8,
            total_iterations=4,
        ),
        env_kwargs={"warmup_steps": 0, "episode_length": 4},
        entropy_schedule="exp",
        entropy_eq=True,
        target_entropy=0.0,
        temperature=0.5,
    )
    state = t.init(jax.random.PRNGKey(0))
    state, metrics = t.train_iteration(state)
    assert np.isfinite(float(metrics["loss_objective"]))

    # the projection layer itself (get_projection_layer wiring of entropy_eq)
    # must pin ANY input dist's entropy to the decayed bound mid-schedule —
    # the mechanism that stops entropy-bonus inflation. (metrics["entropy"]
    # reports the RAW policy dist, which only converges to the bound over
    # many updates via the trust-region loss, so assert on the layer output.)
    from geometry_rl_tpu.rl import gaussian as G

    A = t.env.cfg.action_dim
    p = G.DiagGaussian(jnp.zeros((5, A)), jnp.full((5, A), 2.0))  # inflated std
    q = G.DiagGaussian(jnp.zeros((5, A)), jnp.ones((5, A)))
    step = jnp.asarray(2)
    proj = t.projection(p, q, step=step, initial_entropy=state.initial_entropy)
    bound = t.projection.entropy_bound(step, state.initial_entropy, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(G.entropy(proj)), float(bound), rtol=1e-4
    )
