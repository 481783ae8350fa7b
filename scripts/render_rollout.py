import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Render a trained policy rollout to GIF (RecordVideo equivalent).

    python scripts/render_rollout.py --run-dir logs/r1_final/<run> \
        [--checkpoint best] [--out episode.gif] [--env-index 0] [--steps 100]
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--checkpoint", default="best")
    ap.add_argument("--out", default=None)
    ap.add_argument("--env-index", type=int, default=0)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--num-envs", type=int, default=None, help="override (old checkpoints need the trained count)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from geometry_rl_tpu.config import load_config, trainer_from_config
    from geometry_rl_tpu.train.checkpoint import latest_step, restore_checkpoint
    from geometry_rl_tpu.train.render import record_rollout

    with open(os.path.join(args.run_dir, "hparams.json")) as f:
        cfg = load_config(None, json.load(f))
    if args.num_envs:
        cfg["env"]["num_envs"] = args.num_envs
    trainer = trainer_from_config(cfg)

    ckpt = os.path.join(args.run_dir, args.checkpoint)
    state = trainer.init(jax.random.PRNGKey(0))
    state = restore_checkpoint(ckpt, state, latest_step(ckpt))

    out = args.out or os.path.join(args.run_dir, "rollout.gif")
    record_rollout(trainer, state, out, n_steps=args.steps, env_index=args.env_index)
    print("wrote", out)


if __name__ == "__main__":
    main()
