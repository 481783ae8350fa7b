import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Per-task env stepping throughput (no policy)."""
import time

import jax
import jax.numpy as jnp

from geometry_rl_tpu.envs import make_env

STEPS = 50
for task, B in [
    ("rigid_insertion", 1024),
    ("rigid_pushing", 1024),
    ("rope_closing", 256),
    ("rope_shaping", 256),
    ("cloth_hanging", 128),
]:
    env = make_env(task, num_envs=B)
    key = jax.random.PRNGKey(0)
    state = env.reset(key)
    A = env.cfg.action_dim

    @jax.jit
    def run(state, key):
        def step(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (B, A), minval=-1, maxval=1)
            state, ts = env.step(state, a)
            return (state, key), ts.reward

        (state, key), r = jax.lax.scan(step, (state, key), None, length=STEPS)
        return state, key, r.sum()

    out = run(state, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(out[0], out[1])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{task:28s} B={B:5d}: {dt*1000/STEPS:7.2f} ms/step -> {STEPS*B/dt:>10,.0f} env-steps/s", flush=True)
