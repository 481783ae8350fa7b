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
