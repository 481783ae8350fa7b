#!/bin/bash
# Two-agents follow-up after the stable fix run (86.5% best-train-ckpt eval):
#   1. checkpoint-sweep eval (play --all-checkpoints) — best TRAIN reward is
#      not necessarily best EVAL; the run saved every 10 iters.
#   2. full eval_breakdown on the sweep's best checkpoint.
#   3. optional continuation: resume the run to total_frames=30M (+150 iters)
#      if R5_CONTINUE=1.
set -u
cd /root/repo
LOG=docs/r5_queue.log

# 0. BC rerun (the queue's BC stage failed on the dataset-as-HLO-constant
#    bug, fixed in train/bc.py). Reuses the already-recorded data.npz from
#    the 99.7% flagship — training + eval only, ~10 min of chip time.
bc_ckpt=$(ls -d logs/r5_hepi_insertion/*/best 2>/dev/null | tail -1)
if [ -f logs/r5_bc_insertion/data.npz ] && [ -n "${bc_ckpt:-}" ]; then
  # --checkpoint restores the flagship normalizer stats: the recorded tobs
  # were normalized with them, so the cloned policy must be evaluated with
  # the same normalizer.
  echo "[r5:bc2] start $(date)" >> "$LOG"
  timeout 3000 python -m geometry_rl_tpu.train.bc_cli \
    --config rigid_insertion_multi_hepi_trpl \
    --override env.num_envs=1024 env.kwargs.warmup_steps=0 \
      collector.frames_per_batch=102400 \
    --checkpoint "$bc_ckpt" --fresh-actor \
    --data logs/r5_bc_insertion/data.npz --epochs 50 \
    --eval-steps 400 --success-threshold 0.1 \
    --out-dir logs/r5_bc_insertion > docs/r5_bc_insertion.log 2>&1
  echo "[r5:bc2] rc=$? $(date)" >> "$LOG"
  cp logs/r5_bc_insertion/bc_history.json docs/bc_insertion.json 2>/dev/null
fi

run=$(ls -d logs/r5_two_agents_fix/* | tail -1)
echo "[r5-2afu] start run=$run $(date)" >> "$LOG"

timeout 3600 python -m geometry_rl_tpu.train.play --run-dir "$run" \
  --all-checkpoints --episodes-steps 400 --success-threshold 0.1 \
  > docs/two_agents_fix_sweep_r5.log 2>&1
echo "[r5-2afu] sweep rc=$? $(date)" >> "$LOG"
cp "$run"/eval.json docs/runs_two_agents_fix_r5_sweep.json 2>/dev/null

if [ "${R5_CONTINUE:-0}" = "1" ]; then
  echo "[r5-2afu] continuation to 30M $(date)" >> "$LOG"
  timeout 7000 python -m geometry_rl_tpu.train.cli \
    --config rigid_insertion_two_agents_multi_hepi_trpl \
    --override logger.log_dir=logs/r5_two_agents_fix30 \
      logger.checkpoint.save_interval=10 \
      collector.total_frames=30000000 \
    --resume "$run/checkpoints" \
    > docs/two_agents_fix30_r5.log 2>&1
  echo "[r5-2afu] cont rc=$? $(date)" >> "$LOG"
  run30=$(ls -d logs/r5_two_agents_fix30/* | tail -1)
  timeout 1800 python scripts/eval_breakdown.py --run-dir "$run30" \
    --out docs/runs_two_agents_fix30_r5_eval.json \
    >> docs/two_agents_fix30_r5.log 2>&1
  echo "[r5-2afu] cont eval rc=$? $(date)" >> "$LOG"
  mkdir -p docs/runs/r5_two_agents_fix30
  cp "$run30"/metrics.jsonl docs/runs/r5_two_agents_fix30/ 2>/dev/null
fi
echo "[r5-2afu] done $(date)" >> "$LOG"
