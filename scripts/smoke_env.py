import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Env smoke check — the examples/torchrl/test_orbit_env.py equivalent:
build a task env, roll 5 random steps, print the observation/timestep specs.

    python scripts/smoke_env.py --task rigid_insertion --num-envs 4
"""

import argparse

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="rigid_insertion")
    ap.add_argument("--num-envs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    from geometry_rl_tpu.envs import make_env

    env = make_env(args.task, num_envs=args.num_envs)
    print(f"task={args.task} num_envs={args.num_envs} action_dim={env.cfg.action_dim}")
    print("obs spec:")
    for group in env.obs_spec.names:
        terms = ", ".join(
            f"{n}[{d}]" for n, d in zip(env.obs_spec.names[group], env.obs_spec.dims[group])
        )
        print(f"  {group:18s} ({env.obs_spec.group_dim(group):5d}): {terms}")

    key = jax.random.PRNGKey(0)
    state = env.reset(key)
    for t in range(args.steps):
        key, k = jax.random.split(key)
        action = jax.random.uniform(k, (args.num_envs, env.cfg.action_dim), minval=-1, maxval=1)
        state, ts = env.step(state, action)
        print(
            f"step {t}: reward mean {float(ts.reward.mean()):+.4f} "
            f"done {int(ts.done.sum())}/{args.num_envs} "
            f"obs finite {all(bool(jnp.isfinite(v).all()) for v in ts.obs.values())}"
        )
    print("OK")


if __name__ == "__main__":
    main()
