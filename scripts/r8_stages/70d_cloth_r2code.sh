# THE decisive cloth experiment (round-5): run the EXACT r2-era binary
# (worktree at d2c44f2 — the commit that produced the 88.5% flagship) on
# today's chip, same config, same seed 0. Outcome ~55% => the r2 headline
# does not reproduce even under its own code (toolchain/draw variance; the
# 88.5% is a retired lucky draw). Outcome ~88% => r2 code is reproducibly
# better and the cross-version equality analysis missed something (bisect
# for real). Uses the r2-era eval_breakdown for era consistency.
dl="${R8_DEADLINE:-$(date -d '2026-08-21 18:05 UTC' +%s)}"
room=$(( dl - $(date +%s) - 2100 ))
if [ "$room" -lt 1500 ]; then
  echo "[r8:cloth_r2code] SKIP: only ${room}s left $(date)" >> "$LOG"
else
  (cd /tmp/wt_r2 && timeout 2400 python -m geometry_rl_tpu.train.cli \
    --config cloth_hanging_multi_hepi_trpl \
    --override logger.log_dir=/root/repo/logs/r8_cloth_r2code \
      logger.checkpoint.save_interval=50 \
    > /root/repo/docs/r8_cloth_r2code.log 2>&1)
  echo "[r8:cloth_r2code] train rc=$? $(date)" >> "$LOG"
  run=$(ls -d logs/r8_cloth_r2code/* 2>/dev/null | tail -1)
  if [ -n "${run:-}" ]; then
    (cd /tmp/wt_r2 && timeout 2400 python scripts/eval_breakdown.py \
      --run-dir "/root/repo/$run" --threshold 0.2 \
      >> /root/repo/docs/r8_cloth_r2code.log 2>&1)
    echo "[r8:cloth_r2code] eval rc=$? $(date)" >> "$LOG"
    cp "$run/eval_breakdown.json" docs/r8_cloth_r2code_eval.json 2>/dev/null
    mkdir -p docs/runs/r8_cloth_r2code
    cp "$run"/metrics.jsonl "$run"/hparams.json docs/runs/r8_cloth_r2code/ 2>/dev/null
  fi
fi
