#!/bin/bash
# CONTINGENCY (launch manually): second seed of the two-agents KL-stability
# run, for the >=90.8% / min-shape >=75% bar (VERDICT round-2 item 1) if the
# 30M continuation + checkpoint sweep stay short of it. The task config
# already carries the measured stability fix (std floor/cap + grad clip);
# this only changes the seed. ~70 min train + ~12 min eval on the chip —
# do NOT start while another chip job is running (exclusive axon relay).
set -u
cd /root/repo
LOG=docs/r5_queue.log
echo "[r6:2a_seed2] train start $(date)" >> "$LOG"
timeout 5400 python -m geometry_rl_tpu.train.cli \
  --config rigid_insertion_two_agents_multi_hepi_trpl \
  --override logger.log_dir=logs/r6_two_agents_seed2 \
    logger.checkpoint.save_interval=10 \
    collector.total_frames=15000000 \
    seed=1 \
  > docs/r6_two_agents_seed2.log 2>&1
echo "[r6:2a_seed2] train rc=$? $(date)" >> "$LOG"
run=$(ls -d logs/r6_two_agents_seed2/* 2>/dev/null | tail -1)
[ -z "${run:-}" ] && exit 0
timeout 2400 python scripts/eval_breakdown.py --run-dir "$run" \
  --threshold 0.1 --out docs/r6_two_agents_seed2_eval.json \
  >> docs/r6_two_agents_seed2.log 2>&1
echo "[r6:2a_seed2] eval rc=$? run=$run $(date)" >> "$LOG"
# checkpoint sweep: best EVAL checkpoint, not best train reward
timeout 2400 python -m geometry_rl_tpu.train.play --run-dir "$run" \
  --all-checkpoints --episodes-steps 400 --success-threshold 0.1 \
  > docs/r6_two_agents_seed2_sweep.log 2>&1
echo "[r6:2a_seed2] sweep rc=$? $(date)" >> "$LOG"
cp "$run"/eval.json docs/r6_two_agents_seed2_sweep.json 2>/dev/null
mkdir -p docs/runs/r6_two_agents_seed2
cp "$run"/metrics.jsonl "$run"/hparams.json docs/runs/r6_two_agents_seed2/ 2>/dev/null
