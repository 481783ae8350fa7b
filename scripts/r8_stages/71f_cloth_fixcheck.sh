# HEAD with ONLY 75f9112's layout+unroll reverted (/tmp/wt_fix), cloth
# seed 0, bf16: if this reproduces the r2 point (~89.0%) exactly, every
# other commit since d2c44f2 is behaviorally inert for this program and the
# flattened-layout commit is the sole draw-changer; a revert restores the
# r2 training stream on HEAD.
dl="${R8_DEADLINE:-$(date -d '2026-08-21 18:05 UTC' +%s)}"
room=$(( dl - $(date +%s) - 2100 ))
if [ "$room" -lt 1500 ]; then
  echo "[r8:cloth_fixcheck] SKIP: only ${room}s left $(date)" >> "$LOG"
else
  (cd /tmp/wt_fix && timeout 2400 python -m geometry_rl_tpu.train.cli \
    --config cloth_hanging_multi_hepi_trpl \
    --override logger.log_dir=/root/repo/logs/r8_cloth_fixcheck \
      logger.checkpoint.save_interval=50 \
    > /root/repo/docs/r8_cloth_fixcheck.log 2>&1)
  echo "[r8:cloth_fixcheck] train rc=$? $(date)" >> "$LOG"
  run=$(ls -d logs/r8_cloth_fixcheck/* 2>/dev/null | tail -1)
  if [ -n "${run:-}" ]; then
    timeout 2400 python scripts/eval_breakdown.py \
      --run-dir "$run" --threshold 0.2 --save-distances \
      --out docs/r8_cloth_fixcheck_eval.json \
      >> docs/r8_cloth_fixcheck.log 2>&1
    echo "[r8:cloth_fixcheck] eval rc=$? $(date)" >> "$LOG"
    mkdir -p docs/runs/r8_cloth_fixcheck
    cp "$run"/metrics.jsonl "$run"/hparams.json docs/runs/r8_cloth_fixcheck/ 2>/dev/null
  fi
fi
