"""Behavior cloning + rollout-data recording.

Replaces `examples/torchrl/behavior_cloning.py` (MSE on recorded actions,
minibatch Adam, periodic env eval) and `AgentBuilder.generate_data`
(agent.py:103-131, rollouts saved to logs/data/data.pt). Data lives in an
.npz of transformed observation groups + actions, with the recording-time
normalizer stats saved alongside so BC sees the same inputs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..rl import gaussian as G
from ..rl.obs_pipeline import obs_norm_step
from .ppo import Trainer, TrainState


def generate_data(trainer: Trainer, state: TrainState, n_steps: int, path: Optional[str] = None):
    """Roll out the current policy and record (tobs, action) pairs."""
    env = trainer.env

    def step_fn(carry, _):
        env_state, obs, key = carry
        key, k = jax.random.split(key)
        _, tobs = obs_norm_step(state.norm, obs, update=False)
        dist = trainer._policy_dist(state.actor_params, tobs)
        action = G.sample(k, dist)
        env_state, ts = env.step(env_state, action)
        return (env_state, ts.obs, key), (tobs, action)

    key = jax.random.fold_in(state.key, 99)
    env_state = env.reset(key)
    obs = env.observe(env_state)
    _, (tobs, actions) = jax.lax.scan(step_fn, (env_state, obs, key), None, length=n_steps)

    B = env.cfg.num_envs
    flat = lambda x: np.asarray(x).reshape((n_steps * B,) + x.shape[2:])  # noqa: E731
    data = {f"obs_{k}": flat(v) for k, v in tobs.items()}
    data["action"] = flat(actions)
    data["env_ids"] = np.tile(np.arange(B, dtype=np.int32), n_steps)
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(path, **data)
    return data


def behavior_cloning(
    trainer: Trainer,
    state: TrainState,
    data: Dict[str, np.ndarray],
    epochs: int = 50,
    batch_size: int = 256,
    lr: float = 3e-4,
    eval_every: int = 10,
    eval_steps: int = 0,
    seed: int = 0,
) -> Tuple[TrainState, list]:
    """Fit the policy mean to recorded actions with MSE (behavior_cloning.py:
    minibatch Adam; every `eval_every` epochs optionally evaluate)."""
    # The dataset is device_put ONCE and passed as jit ARGUMENTS below.
    # Closing over concrete arrays bakes them into the compiled program as
    # constants — for a ~10^5-transition dataset that serializes hundreds of
    # MB of HLO, which remote-compile services reject outright.
    tobs = jax.device_put({k[len("obs_") :]: jnp.asarray(v) for k, v in data.items() if k.startswith("obs_")})
    actions = jax.device_put(jnp.asarray(data["action"]))
    env_ids = jax.device_put(jnp.asarray(data["env_ids"]))
    n = actions.shape[0]

    tx = optax.adam(lr)
    params = state.actor_params
    opt_state = tx.init(params)

    def loss_fn(p, mb_obs, mb_act, mb_ids):
        dist = trainer._policy_dist(p, mb_obs, mb_ids)
        return jnp.mean((dist.mean - mb_act) ** 2)

    @jax.jit
    def run_epoch(p, o, perm, d_obs, d_act, d_ids):
        # One scan over the epoch's minibatch index matrix: O(epochs)
        # dispatches instead of O(minibatches) — the per-call overhead of a
        # tunneled accelerator dominates 256-sample updates otherwise.
        def body(carry, idx):
            p, o = carry
            mb_obs = jax.tree_util.tree_map(lambda x: x[idx], d_obs)
            loss, grads = jax.value_and_grad(loss_fn)(p, mb_obs, d_act[idx], d_ids[idx])
            upd, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, upd), o), loss

        (p, o), losses = jax.lax.scan(body, (p, o), perm)
        return p, o, jnp.mean(losses)

    rng = np.random.default_rng(seed)
    history = []
    n_batches = max(1, n // batch_size)
    for epoch in range(epochs):
        perm = rng.permutation(n)[: n_batches * batch_size].reshape(n_batches, batch_size)
        params, opt_state, mean_loss = run_epoch(
            params, opt_state, jnp.asarray(perm), tobs, actions, env_ids
        )
        entry = {"epoch": epoch, "bc_loss": float(mean_loss)}
        if eval_steps and eval_every and epoch % eval_every == 0:
            ret = trainer.eval_rollout(state._replace(actor_params=params), n_steps=eval_steps)
            entry["eval_reward"] = float(ret)
        history.append(entry)
    return state._replace(actor_params=params), history
