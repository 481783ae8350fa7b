"""Headline benchmark: rigid_insertion collection throughput on TPU.

Measures env-steps/sec of the full collection loop — batched XPBD physics
(decimation 4), observation extraction, normalization, graph build, and the
HEPi policy forward — i.e. what the reference's `sampling_time` covers
(train.py:232). Baseline target: >= 50,000 env-steps/sec on v5e-8
(BASELINE.md). On multi-device hosts the env axis is sharded over all chips
(the framework's DP layout); on one chip it runs single-device.

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

    # shard the env axis over every available device (no-op on one chip)
    n_dev = len(jax.devices())
    if n_dev > 1 and NUM_ENVS % n_dev == 0:
        from geometry_rl_tpu.parallel import make_mesh, replicated, shard_env_pytree

        mesh = make_mesh()
        env_state = shard_env_pytree(env_state, mesh, NUM_ENVS)
        obs = shard_env_pytree(obs, mesh, NUM_ENVS)
        norm = jax.device_put(norm, replicated(mesh))
        params = jax.device_put(params, replicated(mesh))

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
