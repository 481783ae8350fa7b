"""Training entry point — `python -m geometry_rl_tpu.train.cli`.

The examples/torchrl/train.py equivalent: load a task config, build the
agent, loop collect+update iterations (each one jitted XLA program), log
per-iteration scalars (same key set), checkpoint best/interval, resume.

    python -m geometry_rl_tpu.train.cli --config rigid_insertion_multi_hepi_trpl \
        --override env.num_envs=256 collector.total_frames=2000000
"""

from __future__ import annotations

import argparse
import os
import time
from datetime import datetime

import jax


def parse_overrides(pairs):
    out = {}
    for pair in pairs or []:
        key, _, val = pair.partition("=")
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        # Hydra-style lowercase booleans first: ast.literal_eval would leave
        # "true"/"false" as strings, and bool("false") is True downstream.
        if val.lower() in ("true", "false"):
            node[parts[-1]] = val.lower() == "true"
            continue
        try:
            import ast

            node[parts[-1]] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            node[parts[-1]] = val
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="config name or path")
    ap.add_argument("--override", nargs="*", default=[], help="dot.key=value overrides")
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    args = ap.parse_args(argv)

    from ..config import load_config, trainer_from_config
    from .checkpoint import restore_checkpoint, save_checkpoint
    from .logging import MetricsLogger

    cfg = load_config(args.config, parse_overrides(args.override))
    trainer = trainer_from_config(cfg)

    run_name = f"{cfg['task']}_{cfg['model']}_{cfg['algo']}_{datetime.now().strftime('%y_%m_%d-%H_%M_%S')}"
    log_dir = os.path.join(cfg["logger"]["log_dir"], run_name)
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    logger = MetricsLogger(log_dir, use_wandb=cfg["logger"].get("wandb", False))
    logger.log_hparams(cfg)

    state = trainer.init(jax.random.PRNGKey(cfg["seed"]))
    papi_state = trainer.papi_init(state) if trainer.cfg.papi_steps else None
    start_iter = 0
    if args.resume or cfg["logger"]["checkpoint"].get("load_dir"):
        load_dir = args.resume or cfg["logger"]["checkpoint"]["load_dir"]
        from .checkpoint import latest_step

        step = latest_step(load_dir)
        state = restore_checkpoint(load_dir, state, step)
        start_iter = (step or 0) + 1
        print(f"Resumed from {load_dir} @ iteration {step}")
        if papi_state is not None:
            # PAPI's cross-iteration carry (policy ring buffer, LR annealing)
            # is checkpointed beside the train state; without it a resumed
            # papi_steps run would restart at lr_scale=1 / empty history.
            papi_dir = load_dir.rstrip("/") + "_papi"
            if latest_step(papi_dir) is not None:
                papi_state = restore_checkpoint(papi_dir, papi_state)
                print(f"Resumed PAPI state from {papi_dir}")
            else:
                print(f"WARNING: no PAPI state at {papi_dir}; LR anneal/history reset")

    total_iterations = max(1, cfg["collector"]["total_frames"] // cfg["collector"]["frames_per_batch"])
    save_interval = cfg["logger"]["checkpoint"]["save_interval"]
    save_best = cfg["logger"]["checkpoint"]["save_best"]
    best_reward = -float("inf")
    frames_per_batch = trainer.cfg.steps_per_batch * trainer.env.cfg.num_envs

    start = time.time()
    for i in range(start_iter, total_iterations):
        t0 = time.time()
        if papi_state is not None:
            state, papi_state, metrics = trainer.train_iteration_papi(state, papi_state)
        else:
            state, metrics = trainer.train_iteration(state)
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["train/iteration_time"] = time.time() - t0
        metrics["train/frames"] = (i + 1) * frames_per_batch
        logger.log(i, metrics)

        reward = metrics.get("train/reward", float("nan"))
        print(
            f"iter {i}/{total_iterations} reward={reward:.3f} "
            f"kl={metrics.get('kl', 0):.4f} ESS={metrics.get('ESS', 0):.3f} "
            f"({metrics['train/iteration_time']:.1f}s)",
            flush=True,
        )
        if save_interval > 0 and i % save_interval == 0:
            save_checkpoint(ckpt_dir, i, state, metrics={"reward": reward})
            if papi_state is not None:
                save_checkpoint(ckpt_dir + "_papi", i, papi_state)
        if save_best and reward == reward and reward > best_reward:  # NaN-safe
            best_reward = reward
            save_checkpoint(os.path.join(log_dir, "best"), i, state, metrics={"reward": reward})

    save_checkpoint(ckpt_dir, total_iterations - 1, state)
    if papi_state is not None:
        save_checkpoint(ckpt_dir + "_papi", total_iterations - 1, papi_state)
    print(f"Training took {time.time() - start:.1f}s")
    logger.close()


if __name__ == "__main__":
    main()
