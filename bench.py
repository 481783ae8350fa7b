"""Headline benchmark: rigid_insertion collection throughput on TPU.

Measures env-steps/sec of the full collection loop — batched XPBD physics
(1000 envs, decimation 4), observation extraction, normalization, graph build,
and the HEPi policy forward — i.e. what the reference's `sampling_time` covers
(train.py:232). Baseline target: >= 50,000 env-steps/sec (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE = 50_000.0  # env-steps/sec north star (BASELINE.md)
NUM_ENVS = 1024
SCAN_STEPS = 50


def main():
    from geometry_rl_tpu.rl import gaussian as G
    from geometry_rl_tpu.rl.obs_pipeline import obs_norm_init, obs_norm_step
    from geometry_rl_tpu.train import TrainConfig
    from geometry_rl_tpu.train.builders import build_agent

    trainer = build_agent(
        task="rigid_insertion",
        model="hepi",
        num_envs=NUM_ENVS,
        latent_dim=64,
        num_ori=16,
        train_cfg=TrainConfig(steps_per_batch=SCAN_STEPS, mini_batch_size=1000),
        env_kwargs={"warmup_steps": 0},
        dtype=jnp.bfloat16,
    )
    env = trainer.env
    key = jax.random.PRNGKey(0)
    env_state = env.reset(key)
    obs = env.observe(env_state)
    norm = obs_norm_init(env.obs_spec.group_dim("scalars"))
    _, tobs = obs_norm_step(norm, obs, update=False)
    params = trainer.policy.init(key, *trainer.policy_builder.build(tobs))

    @jax.jit
    def collect(env_state, obs, norm, key):
        def step(carry, _):
            env_state, obs, norm, key = carry
            key, k = jax.random.split(key)
            norm, tobs = obs_norm_step(norm, obs, update=True)
            graph, feats = trainer.policy_builder.build(tobs)
            dist = trainer.policy.apply(params, graph, feats)
            action = G.sample(k, dist)
            env_state, ts = env.step(env_state, action)
            return (env_state, ts.obs, norm, key), ts.reward

        (env_state, obs, norm, key), rewards = jax.lax.scan(
            step, (env_state, obs, norm, key), None, length=SCAN_STEPS
        )
        return env_state, obs, norm, key, rewards.sum()

    # warmup/compile
    out = collect(env_state, obs, norm, key)
    jax.block_until_ready(out)
    env_state, obs, norm, key = out[:4]

    # timed runs
    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = collect(env_state, obs, norm, key)
        env_state, obs, norm, key = out[:4]
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    steps_per_sec = n_runs * SCAN_STEPS * NUM_ENVS / dt
    print(
        json.dumps(
            {
                "metric": "rigid_insertion_hepi_collection_env_steps_per_sec",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/sec",
                "vs_baseline": round(steps_per_sec / BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
