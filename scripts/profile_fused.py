import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""TPU validation + microbenchmark of the fused Pallas HEPi forward.

Compares the Flax/XLA policy forward against ops/pallas_hepi (compiled, not
interpret) on the rigid_insertion graph: numerical agreement, forward
latency, and end-to-end collection throughput with/without fusion.

    python scripts/profile_fused.py [--envs 1024]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from geometry_rl_tpu.rl.obs_pipeline import obs_norm_init, obs_norm_step
from geometry_rl_tpu.train import TrainConfig
from geometry_rl_tpu.train.builders import build_agent


def timeit(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--tile", type=int, default=16)
    args = ap.parse_args()

    def make(fused):
        return build_agent(
            task="rigid_insertion", model="hepi", num_envs=args.envs, latent_dim=64,
            num_ori=16, dtype=jnp.bfloat16,
            train_cfg=TrainConfig(steps_per_batch=100, mini_batch_size=1000),
            env_kwargs={"warmup_steps": 0}, fused_collection=fused,
        )

    tr = make(False)
    env = tr.env
    key = jax.random.PRNGKey(0)
    env_state = env.reset(key)
    obs = env.observe(env_state)
    norm = obs_norm_init(env.obs_spec.group_dim("scalars"))
    _, tobs = obs_norm_step(norm, obs, update=False)
    graph, feats = tr.policy_builder.build(tobs)
    params = tr.policy.init(key, graph, feats)

    from geometry_rl_tpu.models.hepi_fused import hepi_policy_dist_fused

    @jax.jit
    def fwd_xla(params):
        d = tr.policy.apply(params, graph, feats)
        return d.mean, d.std

    @jax.jit
    def fwd_fused(params):
        d = hepi_policy_dist_fused(tr.policy, params, graph, feats, tile_envs=args.tile)
        return d.mean, d.std

    mx, sx = fwd_xla(params)
    mf, sf = fwd_fused(params)
    err_m = float(jnp.abs(mx - mf).max())
    err_s = float(jnp.abs(sx - sf).max())
    scale = float(jnp.abs(mx).max())
    print(f"parity: max |mean diff| {err_m:.2e} (scale {scale:.2e}), |std diff| {err_s:.2e}")
    # bf16 XLA vs f32 fused: tolerance is bf16 resolution on the output scale
    assert err_m < max(3e-2 * scale, 3e-2), err_m
    assert err_s < 3e-2, err_s

    t_x = timeit(fwd_xla, params)
    t_f = timeit(fwd_fused, params)
    print(f"policy fwd  XLA: {t_x:.2f} ms   fused: {t_f:.2f} ms   ({t_x / t_f:.2f}x)")

    # end-to-end collection iteration
    for fused, tag in ((False, "XLA  "), (True, "fused")):
        trc = make(fused)
        st = trc.init(jax.random.PRNGKey(1))
        coll = jax.jit(lambda s: trc._collect(s)[1].reward.sum())
        jax.block_until_ready(coll(st))
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(coll(st))
        dt = (time.perf_counter() - t0) / 3
        steps = 100 * args.envs
        print(f"collection {tag}: {dt*1000:.1f} ms / iter = {steps/dt/1e3:.1f}k env-steps/s")


if __name__ == "__main__":
    main()
