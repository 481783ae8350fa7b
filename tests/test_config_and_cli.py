"""Config system, checkpointing, logging, BC, and play tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu.config import available_configs, load_config, trainer_from_config
from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.bc import behavior_cloning, generate_data
from geometry_rl_tpu.train.builders import build_agent
from geometry_rl_tpu.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from geometry_rl_tpu.train.logging import MetricsLogger


def test_all_15_reference_configs_exist():
    names = available_configs()
    assert len(names) == 15
    for expected in [
        "rigid_insertion_multi_hepi_trpl",
        "rigid_insertion_multi_empn_trpl",
        "rigid_insertion_multi_transformer_trpl",
        "rigid_pushing_multi_hepi_trpl",
        "rigid_sliding_multi_hepi_trpl",
        "rigid_insertion_two_agents_multi_hepi_trpl",
        "cloth_hanging_multi_hepi_trpl",
        "rope_closing_hepi_trpl",
        "rope_shaping_hepi_trpl",
    ]:
        assert expected in names, expected


def test_load_config_defaults_and_merge():
    cfg = load_config("rigid_insertion_multi_hepi_trpl")
    assert cfg["task"] == "rigid_insertion"
    assert cfg["env"]["num_envs"] == 1000
    assert cfg["collector"]["frames_per_batch"] == 100_000
    assert cfg["algorithm"]["projection"]["mean_bound"] == 0.05
    cfg2 = load_config("rigid_insertion_multi_hepi_trpl", {"env": {"num_envs": 8}})
    assert cfg2["env"]["num_envs"] == 8
    assert cfg2["algorithm"]["objective"]["ppo_epochs"] == 5


def test_cloth_and_rope_scales():
    cloth = load_config("cloth_hanging_multi_hepi_trpl")
    assert cloth["env"]["num_envs"] == 100
    assert cloth["algorithm"]["objective"]["mini_batch_size"] == 200
    rope = load_config("rope_shaping_hepi_trpl")
    assert rope["collector"]["total_frames"] == 10_000_000


@pytest.fixture(scope="module")
def small_trainer_state():
    trainer = build_agent(
        task="rigid_insertion",
        model="hepi",
        num_envs=2,
        latent_dim=16,
        num_ori=4,
        train_cfg=TrainConfig(steps_per_batch=4, ppo_epochs=1, mini_batch_size=8),
        env_kwargs={"warmup_steps": 0, "episode_length": 4},
    )
    state = trainer.init(jax.random.PRNGKey(0))
    return trainer, state


def test_trainer_from_config():
    cfg = load_config(
        "rigid_insertion_multi_hepi_trpl",
        {
            "env": {"num_envs": 2, "kwargs": {"episode_length": 4, "warmup_steps": 0}},
            "collector": {"frames_per_batch": 8, "total_frames": 16},
            "algorithm": {"latent_dim": 16, "num_ori": 4, "objective": {"mini_batch_size": 8, "ppo_epochs": 1}},
        },
    )
    trainer = trainer_from_config(cfg)
    assert trainer.cfg.steps_per_batch == 4
    state = trainer.init(jax.random.PRNGKey(0))
    state, metrics = trainer.train_iteration(state)
    assert np.isfinite(float(metrics["loss_objective"]))


def test_checkpoint_roundtrip(tmp_path, small_trainer_state):
    trainer, state = small_trainer_state
    state1, _ = trainer.train_iteration(state)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 3, state1, metrics={"reward": 1.0})
    assert latest_step(d) == 3
    restored = restore_checkpoint(d, state)
    # params identical
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.actor_params), jax.tree_util.tree_leaves(state1.actor_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # normalizer stats restored (the reference needed a merge workaround)
    np.testing.assert_allclose(
        np.asarray(restored.norm.position.count), np.asarray(state1.norm.position.count)
    )
    assert int(restored.num_updates) == int(state1.num_updates)


def test_multihost_requires_shardable_env_axis(tmp_path, monkeypatch):
    """A pod launch whose env count can't shard must fail fast, not run N
    duplicate trainings that collide in the collective checkpoint saves."""
    import pytest

    from geometry_rl_tpu.train import cli

    monkeypatch.setattr(cli.jax, "process_count", lambda: 2)
    # the run-name stamp broadcast also keys off process_count; make it a
    # no-op since there is only one real process here
    from jax.experimental import multihost_utils

    monkeypatch.setattr(multihost_utils, "broadcast_one_to_all", lambda x: x)
    with pytest.raises(ValueError, match="multihost launch"):
        cli.main(
            [
                "--config",
                "rigid_insertion_multi_hepi_trpl",
                "--override",
                "env.num_envs=7",  # 7 % 8 devices != 0
                "env.kwargs.warmup_steps=0",
                "env.kwargs.episode_length=4",
                "collector.frames_per_batch=14",
                "collector.total_frames=14",
                "algorithm.latent_dim=16",
                "algorithm.num_ori=4",
                f"logger.log_dir={tmp_path}",
            ]
        )


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path))
    logger.log(0, {"train/reward": 1.5, "kl": jnp.asarray(0.1)})
    logger.log_hparams({"task": "x"})
    logger.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["train/reward"] == 1.5
    assert abs(rows[0]["kl"] - 0.1) < 1e-6
    assert json.load(open(tmp_path / "hparams.json"))["task"] == "x"


def test_generate_data_and_bc(tmp_path, small_trainer_state):
    trainer, state = small_trainer_state
    data = generate_data(trainer, state, n_steps=6, path=str(tmp_path / "data.npz"))
    assert data["action"].shape == (12, 6)
    assert os.path.exists(tmp_path / "data.npz")

    new_state, history = behavior_cloning(trainer, state, data, epochs=3, batch_size=4)
    assert len(history) == 3
    assert history[-1]["bc_loss"] <= history[0]["bc_loss"] * 2  # sane, not diverging
    # params changed
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(new_state.actor_params),
            jax.tree_util.tree_leaves(state.actor_params),
        )
    ]
    assert max(diffs) > 0


def test_bc_cli_end_to_end(tmp_path):
    """The full bc_cli workflow (behavior_cloning.py:14-142 equivalent):
    record a dataset, then clone into a FRESH actor from the saved .npz with
    a final deterministic success eval. Exercises the dataset-as-jit-argument
    path (closing over the data bakes it into the HLO as constants, which
    remote-compile services reject for real dataset sizes)."""
    from geometry_rl_tpu.train import bc_cli

    overrides = [
        "env.num_envs=2",
        "env.kwargs.episode_length=4",
        "env.kwargs.warmup_steps=0",
        "collector.frames_per_batch=8",
        "collector.total_frames=16",
        "algorithm.latent_dim=16",
        "algorithm.num_ori=4",
        "algorithm.objective.mini_batch_size=8",
        "algorithm.objective.ppo_epochs=1",
    ]
    out = str(tmp_path / "bc")
    bc_cli.main(
        [
            "--config", "rigid_insertion_multi_hepi_trpl",
            "--record-steps", "6", "--epochs", "2", "--batch-size", "4",
            "--eval-every", "0", "--eval-steps", "0",
            "--out-dir", out, "--override", *overrides,
        ]
    )  # fmt: skip
    assert os.path.exists(os.path.join(out, "data.npz"))

    out2 = str(tmp_path / "bc2")
    bc_cli.main(
        [
            "--config", "rigid_insertion_multi_hepi_trpl",
            "--data", os.path.join(out, "data.npz"),
            "--epochs", "2", "--batch-size", "4",
            "--eval-every", "0", "--eval-steps", "4",
            "--fresh-actor", "--success-threshold", "0.1",
            "--out-dir", out2, "--override", *overrides,
        ]
    )  # fmt: skip
    hist = json.load(open(os.path.join(out2, "bc_history.json")))
    final = hist[-1]["final_eval"]
    assert 0.0 <= final["success_rate"] <= 1.0
    assert final["transitions"] == 12
    assert latest_step(os.path.join(out2, "cloned")) == 2


def test_onpolicy_runner(tmp_path):
    from geometry_rl_tpu.train.runner import OnPolicyRunner

    runner = OnPolicyRunner(
        task="rigid_pushing",
        model="transformer",
        algo="ppo",
        num_envs=2,
        steps_per_env=4,
        log_dir=str(tmp_path),
        latent_dim=16,
        env_kwargs={"episode_length": 4},
    )
    runner.learn(2)
    assert runner.iteration == 2
    runner.save()
    # inference policy runs
    obs = runner.trainer.env.observe(runner.state.env_state)
    act = runner.get_inference_policy()(obs)
    assert act.shape == (2, runner.trainer.env.cfg.action_dim)


def test_parse_overrides_types():
    """CLI overrides parse Hydra-style lowercase booleans to real bools
    (bool("false") is True — the string must never reach a consumer),
    plus ints/floats/strings via literal_eval."""
    from geometry_rl_tpu.train.cli import parse_overrides

    out = parse_overrides(
        ["env.kwargs.self_collision=true", "algorithm.policy.contextual_std=false",
         "env.num_envs=8", "algorithm.lr=3e-4", "model=mlp"]
    )
    assert out["env"]["kwargs"]["self_collision"] is True
    assert out["algorithm"]["policy"]["contextual_std"] is False
    assert out["env"]["num_envs"] == 8
    assert out["algorithm"]["lr"] == 3e-4
    assert out["model"] == "mlp"
