"""Env API: pure-functional batched task environments.

Replaces the reference's manager-based `RLTaskEnv` + `OrbitTorchRLEnv` stack
(SURVEY.md L0-L2): an Env is a static object whose `reset`/`step` are pure
functions over an `EnvState` pytree, designed to live inside a single jitted
`lax.scan` rollout. Auto-reset happens inside `step` (done envs are re-randomized
in place), replacing the randomization manager's mode="reset" pass.

Observations are grouped dicts with the reference's group names — scalars /
position_vectors / velocity_vectors / infos — plus an `ObsSpec` describing the
per-term layout, which is exactly what the graph data layer splits on
(`observation_dim` / `observation_names`, utils_algo_graph.py:68-71).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax.numpy as jnp


class ObsSpec(NamedTuple):
    """Per-group term layout: names[group][i] has dims[group][i] features."""

    names: Dict[str, List[str]]
    dims: Dict[str, List[int]]

    def group_dim(self, group: str) -> int:
        return sum(self.dims[group])


class TimeStep(NamedTuple):
    obs: Dict[str, jnp.ndarray]  # group -> [B, D_group]
    reward: jnp.ndarray  # [B]
    done: jnp.ndarray  # [B] bool (time-out; reference envs terminate on time only)
    info: Dict[str, jnp.ndarray]
