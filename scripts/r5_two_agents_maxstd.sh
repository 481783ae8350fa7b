#!/bin/bash
# Round-3 two-agents fix run: plain TRPL config + smooth per-dim std cap.
#
# Mechanism (docs/diag_two_agents_spike.json): the KL spikes are mean-KL
# outliers on action dims whose contextual std collapsed while irrelevant
# dims inflated past the action clamp to absorb the entropy budget. The
# entctl runs (entropy_eq) treat the symptom and FORCE the collapse via the
# equality bound; the cap removes the inflation cheat at the source, so the
# plain config (which reached 90.8% at 10M) is used with max_std=2.0 at 15M.
#
# Success bar (VERDICT item 1): no logged KL > 0.1 anywhere in the run AND
# best-ckpt eval >= 90.8% with min per-shape >= 75%.
set -u
cd /root/repo
LOG=docs/r5_queue.log
echo "[r5-2a] start $(date)" >> "$LOG"

timeout 7000 python -m geometry_rl_tpu.train.cli \
  --config rigid_insertion_two_agents_multi_hepi_trpl \
  --override logger.log_dir=logs/r5_two_agents_maxstd \
    logger.checkpoint.save_interval=10 \
    collector.total_frames=15000000 \
    algorithm.policy.max_std=2.0 \
  > docs/two_agents_maxstd_r5.log 2>&1
rc=$?
echo "[r5-2a] train rc=$rc $(date)" >> "$LOG"
if [ "$rc" -eq 0 ]; then
  run=$(ls -d logs/r5_two_agents_maxstd/* | tail -1)
  timeout 1800 python scripts/eval_breakdown.py --run-dir "$run" \
    --out docs/runs_two_agents_maxstd_r5_eval.json \
    >> docs/two_agents_maxstd_r5.log 2>&1
  echo "[r5-2a] eval rc=$? run=$run" >> "$LOG"
  mkdir -p docs/runs/r5_two_agents_maxstd
  cp "$run"/metrics.jsonl docs/runs/r5_two_agents_maxstd/ 2>/dev/null
fi
echo "[r5-2a] done $(date)" >> "$LOG"
