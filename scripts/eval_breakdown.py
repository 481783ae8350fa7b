import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Per-shape evaluation breakdown for multi-asset rigid tasks.

Loads a trained run's checkpoint, rolls the deterministic policy, and reports
final object->target distance and success rate PER PEG SHAPE (the multi-asset
generalization axis the paper evaluates).

    python scripts/eval_breakdown.py --run-dir logs/r1_final/<run> [--checkpoint best]
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--checkpoint", default="best")
    ap.add_argument("--episodes", type=int, default=3, help="episodes per env")
    ap.add_argument("--threshold", type=float, default=0.1)
    ap.add_argument("--override", nargs="*", default=[], help="dot.key=value config overrides (e.g. env.kwargs.hole_split=test)")
    ap.add_argument("--out", default="eval_breakdown.json")
    ap.add_argument(
        "--save-distances",
        action="store_true",
        help="also dump per-episode final distances + shape names into the json "
        "(post-hoc success-threshold sweeps / per-shape histograms without re-rolling)",
    )
    args = ap.parse_args()

    from geometry_rl_tpu.config import load_config, trainer_from_config
    from geometry_rl_tpu.rl import gaussian as G
    from geometry_rl_tpu.rl.obs_pipeline import obs_norm_step
    from geometry_rl_tpu.train.checkpoint import latest_step, restore_checkpoint
    from geometry_rl_tpu.train.cli import parse_overrides

    with open(os.path.join(args.run_dir, "hparams.json")) as f:
        cfg = load_config(None, json.load(f))
    if args.override:
        from geometry_rl_tpu.config import _merge

        cfg = _merge(cfg, parse_overrides(args.override))
    trainer = trainer_from_config(cfg)
    env = trainer.env

    ckpt = os.path.join(args.run_dir, args.checkpoint)
    state = trainer.init(jax.random.PRNGKey(0))
    state = restore_checkpoint(ckpt, state, latest_step(ckpt))

    B = env.cfg.num_envs
    n_steps = env.cfg.episode_length * args.episodes

    @jax.jit
    def rollout(key):
        env_state = env.reset(key)
        obs = env.observe(env_state)

        def step_fn(carry, _):
            env_state, obs, key = carry
            key, k = jax.random.split(key)
            _, tobs = obs_norm_step(state.norm, obs, update=False)
            dist = trainer._policy_dist(state.actor_params, tobs)
            env_state, ts = env.step(env_state, dist.mean)
            return (env_state, ts.obs, key), (ts.done, ts.info["object_target_distance"])

        _, (dones, dists) = jax.lax.scan(step_fn, (env_state, obs, key), None, length=n_steps)
        return dones, dists

    dones, dists = rollout(jax.random.PRNGKey(42))
    dones = np.asarray(dones)  # [T, B]
    dists = np.asarray(dists)

    report = {}
    final_d = dists[dones.astype(bool)]
    if hasattr(env, "shape_ids"):  # multi-asset rigid tasks: per-shape split
        shape_ids = np.asarray(env.shape_ids)
        names = env.shape_set.names
        final_shape = np.broadcast_to(shape_ids, dones.shape)[dones.astype(bool)]
        for s, name in enumerate(names):
            sel = final_shape == s
            if sel.sum() == 0:
                continue
            d = final_d[sel]
            report[name] = {
                "episodes": int(sel.sum()),
                "mean_final_distance": round(float(d.mean()), 4),
                "success_rate": round(float((d < args.threshold).mean()), 4),
            }
    overall = {
        "episodes": int(dones.sum()),
        "mean_final_distance": round(float(final_d.mean()), 4),
        "success_rate": round(float((final_d < args.threshold).mean()), 4),
    }
    print(json.dumps({"overall": overall, "per_shape": report}, indent=2))
    payload = {"overall": overall, "per_shape": report}
    if args.save_distances:
        payload["final_distances"] = [round(float(d), 5) for d in final_d]
        if hasattr(env, "shape_ids"):
            payload["final_shapes"] = [names[int(s)] for s in final_shape]
    # Paths with a directory component are taken as given (relative to cwd);
    # bare filenames land inside the run dir.
    out = args.out if os.sep in args.out else os.path.join(args.run_dir, args.out)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
