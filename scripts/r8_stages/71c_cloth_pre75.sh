# cloth flagship at 75f9112's PARENT (18f0055), bf16, seed 0 (regression
# bisect, location probe): ~88% here while HEAD lands ~50% => commit 75f9112
# ("flattened message layout + unrolled minibatch scan") is the culprit;
# ~50% => the regression predates it.
dl="${R8_DEADLINE:-$(date -d '2026-08-21 18:05 UTC' +%s)}"
room=$(( dl - $(date +%s) - 2100 ))
if [ "$room" -lt 1500 ]; then
  echo "[r8:cloth_pre75] SKIP: only ${room}s left $(date)" >> "$LOG"
else
  (cd /tmp/wt_pre75 && timeout 2400 python -m geometry_rl_tpu.train.cli \
    --config cloth_hanging_multi_hepi_trpl \
    --override logger.log_dir=/root/repo/logs/r8_cloth_pre75 \
      logger.checkpoint.save_interval=50 \
    > /root/repo/docs/r8_cloth_pre75.log 2>&1)
  echo "[r8:cloth_pre75] train rc=$? $(date)" >> "$LOG"
  run=$(ls -d logs/r8_cloth_pre75/* 2>/dev/null | tail -1)
  if [ -n "${run:-}" ]; then
    (cd /tmp/wt_pre75 && timeout 2400 python scripts/eval_breakdown.py \
      --run-dir "/root/repo/$run" --threshold 0.2 \
      >> /root/repo/docs/r8_cloth_pre75.log 2>&1)
    echo "[r8:cloth_pre75] eval rc=$? $(date)" >> "$LOG"
    cp "$run/eval_breakdown.json" docs/r8_cloth_pre75_eval.json 2>/dev/null
    mkdir -p docs/runs/r8_cloth_pre75
    cp "$run"/metrics.jsonl "$run"/hparams.json docs/runs/r8_cloth_pre75/ 2>/dev/null
  fi
fi
