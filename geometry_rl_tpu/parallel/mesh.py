"""Device-mesh sharding: the env axis is the data-parallel axis.

The reference is single-process/single-GPU (SURVEY.md §2.11) — its only
parallelism is N PhysX envs in lockstep. TPU-native scaling shards that env
axis across chips over ICI: every [B, ...] array (scene state, observations,
rollout batches) is sharded on B; parameters, optimizer state, and normalizer
stats are replicated. Gradients and metric reductions inside the jitted train
step become psums that XLA inserts automatically from the sharding
annotations (no hand-written collectives needed at this model scale —
latent 64 needs no TP/PP/SP, documented N/A per SURVEY §2.11).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env) axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_env_batched(x: Any, num_envs: int) -> bool:
    return hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs


def shard_env_pytree(tree: Any, mesh: Mesh, num_envs: int) -> Any:
    """Place every [num_envs, ...] leaf sharded over the env axis; everything
    else replicated. Applied to EnvState / obs pytrees before the jitted
    train step so XLA propagates the layout through the whole program.

    Leaves whose field/dict name is "key" are always replicated: a PRNG key
    is uint32[2] (or [4]), so with num_envs == 2 the shape[0] heuristic alone
    would silently shard the key across devices and change RNG semantics."""
    env_s = env_sharding(mesh)
    rep = replicated(mesh)

    def _leaf_name(path) -> str:
        if not path:
            return ""
        last = path[-1]
        return getattr(last, "name", None) or str(getattr(last, "key", ""))

    def place(path, x):
        if _leaf_name(path) != "key" and _is_env_batched(x, num_envs):
            return jax.device_put(x, env_s)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_train_state(state: Any, mesh: Mesh, num_envs: int) -> Any:
    """TrainState placement: env_state/obs sharded on env; params, optimizer
    state, normalizer stats, counters replicated."""
    rep = replicated(mesh)
    return state._replace(
        actor_params=jax.device_put(state.actor_params, rep),
        critic_params=jax.device_put(state.critic_params, rep),
        actor_opt=jax.device_put(state.actor_opt, rep),
        critic_opt=jax.device_put(state.critic_opt, rep),
        norm=jax.device_put(state.norm, rep),
        env_state=shard_env_pytree(state.env_state, mesh, num_envs),
        obs=shard_env_pytree(state.obs, mesh, num_envs),
        key=jax.device_put(state.key, rep),
        num_updates=jax.device_put(state.num_updates, rep),
    )
