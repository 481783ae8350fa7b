# r2-binary cloth seeds (regression adjudication): HEAD seeds span 48-72%
# while the r2 binary's seed 0 reproduces 89%. If the r2 binary's seeds 1-2
# also land ~85-90%, the old program is SYSTEMATICALLY better (real code
# regression); if they land ~50-70%, both programs share the wide seed
# distribution and the original 88.5% was a lucky draw.
dl="${R8_DEADLINE:-$(date -d '2026-08-21 18:05 UTC' +%s)}"
room=$(( dl - $(date +%s) - 2100 ))
if [ "$room" -lt 1500 ]; then
  echo "[r8:cloth_r2code_seed1] SKIP: only ${room}s left $(date)" >> "$LOG"
else
  (cd /tmp/wt_r2 && timeout 2400 python -m geometry_rl_tpu.train.cli \
    --config cloth_hanging_multi_hepi_trpl \
    --override logger.log_dir=/root/repo/logs/r8_cloth_r2code_seed1 \
      logger.checkpoint.save_interval=50 seed=1 \
    > /root/repo/docs/r8_cloth_r2code_seed1.log 2>&1)
  echo "[r8:cloth_r2code_seed1] train rc=$? $(date)" >> "$LOG"
  run=$(ls -d logs/r8_cloth_r2code_seed1/* 2>/dev/null | tail -1)
  if [ -n "${run:-}" ]; then
    (cd /tmp/wt_r2 && timeout 2400 python scripts/eval_breakdown.py \
      --run-dir "/root/repo/$run" --threshold 0.2 \
      >> /root/repo/docs/r8_cloth_r2code_seed1.log 2>&1)
    echo "[r8:cloth_r2code_seed1] eval rc=$? $(date)" >> "$LOG"
    cp "$run/eval_breakdown.json" docs/r8_cloth_r2code_seed1_eval.json 2>/dev/null
    mkdir -p docs/runs/r8_cloth_r2code_seed1
    cp "$run"/metrics.jsonl "$run"/hparams.json docs/runs/r8_cloth_r2code_seed1/ 2>/dev/null
  fi
fi
