"""Checkpoint evaluation — `python -m geometry_rl_tpu.train.play`.

The examples/torchrl/play.py equivalent: rebuild the agent from the run's
saved hparams, restore checkpoints (normalizer stats travel inside the
TrainState — no env-state merge workaround needed), roll out the deterministic
or stochastic policy, and write per-checkpoint mean episode returns to
eval.json (play.py:225-230).
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax


def find_latest_run(log_root: str, prefix: str) -> str:
    """play.py `find_latest_experiment_log_dir` equivalent."""
    candidates = sorted(glob.glob(os.path.join(log_root, f"{prefix}*")))
    if not candidates:
        raise FileNotFoundError(f"no runs matching {prefix} under {log_root}")
    return candidates[-1]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run-dir", required=True, help="training run dir (contains hparams.json)")
    ap.add_argument("--checkpoint", default="best", help="'best', 'checkpoints', or explicit dir")
    ap.add_argument("--episodes-steps", type=int, default=400, help="eval rollout length")
    ap.add_argument("--eval-type", default="mode", choices=["mode", "random"])
    ap.add_argument("--num-envs", type=int, default=None, help="override eval env count")
    args = ap.parse_args(argv)

    from ..config import load_config, trainer_from_config
    from .checkpoint import latest_step, restore_checkpoint

    with open(os.path.join(args.run_dir, "hparams.json")) as f:
        cfg = json.load(f)
    trained_num_envs = cfg["env"]["num_envs"]
    if args.num_envs:
        cfg["env"]["num_envs"] = args.num_envs
    cfg = load_config(None, cfg)
    trainer = trainer_from_config(cfg)

    # Evaluating with a different env count: env-sized leaves (env_state, obs)
    # cannot restore into the reshaped template, and eval_rollout resets the
    # env anyway — restore everything EXCEPT them (exclude-list, so future
    # TrainState fields are restored by default instead of silently kept
    # fresh-initialized).
    fields = None
    if args.num_envs and args.num_envs != trained_num_envs:
        from .ppo import TrainState

        fields = tuple(f for f in TrainState._fields if f not in ("env_state", "obs"))

    template = trainer.init(jax.random.PRNGKey(0))
    ckpt_root = os.path.join(args.run_dir, args.checkpoint)
    results = {}
    steps = sorted(
        int(d) for d in os.listdir(ckpt_root) if d.isdigit()
    ) if os.path.isdir(ckpt_root) else []
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {ckpt_root}")
    for step in steps:
        state = restore_checkpoint(ckpt_root, template, step, fields=fields)
        ret = trainer.eval_rollout(state, n_steps=args.episodes_steps, deterministic=args.eval_type == "mode")
        results[str(step)] = float(ret)
        print(f"checkpoint {step}: mean episode reward {float(ret):.3f}", flush=True)

    out = os.path.join(args.run_dir, "eval.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
