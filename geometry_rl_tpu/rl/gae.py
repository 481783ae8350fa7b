"""Generalized Advantage Estimation — on-device `lax.scan` over time.

Replaces the reference's torchrl `GAE(..., shifted=True)` module
(examples/torchrl/train.py:134-140). `shifted=True` existed only to avoid
torch vmap over the GNN; here the rollout already produces per-step values,
so GAE is a single reverse scan — no second value-network pass.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gae(
    rewards: jnp.ndarray,
    values: jnp.ndarray,
    dones: jnp.ndarray,
    bootstrap_value: jnp.ndarray,
    gamma: float = 0.99,
    lam: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute advantages and value targets.

    Args (time-major; E = num envs):
      rewards:          [T, E]   reward at step t
      values:           [T, E]   V(s_t) under the data-collection critic
      dones:            [T, E]   episode end after step t (terminal OR timeout;
                                 the reference envs are time-out-only, and
                                 orbit bootstraps through timeouts the same way)
      bootstrap_value:  [E]      V(s_{T}) for the state after the last step

    Returns:
      (advantage [T, E], value_target [T, E]) with value_target = adv + values.
    """
    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    not_done = 1.0 - dones.astype(values.dtype)
    deltas = rewards + gamma * next_values * not_done - values

    def step(carry, xs):
        delta, nd = xs
        adv = delta + gamma * lam * nd * carry
        return adv, adv

    _, advs = jax.lax.scan(step, jnp.zeros_like(bootstrap_value), (deltas, not_done), reverse=True)
    return advs, advs + values
