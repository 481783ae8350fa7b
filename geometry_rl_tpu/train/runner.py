"""OnPolicyRunner-style alternative workflow.

The reference ships a second, argparse-driven training path
(`examples/orbit/standalone/workflows/rsl_rl/{train,play,cli_args}.py`) built
on rsl_rl's OnPolicyRunner instead of the Hydra/TorchRL stack. This module is
its equivalent: a compact runner object over the same jitted Trainer, driven
from plain CLI args (scripts/run_onpolicy.py), with `learn()` / `save()` /
`load()` / `get_inference_policy()` in OnPolicyRunner's shape.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .builders import build_agent
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .logging import MetricsLogger
from .ppo import TrainConfig


class OnPolicyRunner:
    def __init__(
        self,
        task: str,
        model: str = "hepi",
        algo: str = "ppo",
        num_envs: int = 256,
        steps_per_env: int = 24,
        log_dir: Optional[str] = None,
        seed: int = 0,
        **agent_kwargs,
    ):
        self.trainer = build_agent(
            task=task,
            model=model,
            num_envs=num_envs,
            algo=algo,
            train_cfg=TrainConfig(algo=algo, steps_per_batch=steps_per_env),
            **agent_kwargs,
        )
        self.state = self.trainer.init(jax.random.PRNGKey(seed))
        self.log_dir = log_dir
        self.logger = MetricsLogger(log_dir) if log_dir else None
        self.iteration = 0

    def learn(self, num_iterations: int, log_interval: int = 1) -> None:
        for _ in range(num_iterations):
            t0 = time.time()
            self.state, metrics = self.trainer.train_iteration(self.state)
            self.iteration += 1
            if self.logger and self.iteration % log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["iteration_time"] = time.time() - t0
                self.logger.log(self.iteration, metrics)

    def save(self, path: Optional[str] = None) -> None:
        path = path or os.path.join(self.log_dir or ".", "checkpoints")
        save_checkpoint(path, self.iteration, self.state)

    def load(self, path: str) -> None:
        self.state = restore_checkpoint(path, self.state, latest_step(path))

    def get_inference_policy(self) -> Callable:
        """Deterministic obs -> action function (OnPolicyRunner semantics)."""
        trainer, state = self.trainer, self.state
        from ..rl.obs_pipeline import obs_norm_step

        @jax.jit
        def policy(obs):
            _, tobs = obs_norm_step(state.norm, obs, update=False)
            dist = trainer._policy_dist(state.actor_params, tobs)
            return dist.mean

        return policy
