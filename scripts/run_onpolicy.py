import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Argparse training entry (rsl_rl workflow equivalent):

    python scripts/run_onpolicy.py --task rigid_pushing --model transformer \
        --algo ppo --num-envs 256 --iterations 100
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="rigid_pushing")
    ap.add_argument("--model", default="hepi")
    ap.add_argument("--algo", default="ppo", choices=["ppo", "trpl"])
    ap.add_argument("--num-envs", type=int, default=256)
    ap.add_argument("--steps-per-env", type=int, default=24)
    ap.add_argument("--iterations", type=int, default=100)
    ap.add_argument("--log-dir", default="logs/onpolicy")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()

    from geometry_rl_tpu.train.runner import OnPolicyRunner

    runner = OnPolicyRunner(
        task=args.task,
        model=args.model,
        algo=args.algo,
        num_envs=args.num_envs,
        steps_per_env=args.steps_per_env,
        log_dir=args.log_dir,
        seed=args.seed,
    )
    if args.resume:
        runner.load(args.resume)
    runner.learn(args.iterations)
    runner.save()
    print(f"done: {args.iterations} iterations -> {args.log_dir}")


if __name__ == "__main__":
    main()
