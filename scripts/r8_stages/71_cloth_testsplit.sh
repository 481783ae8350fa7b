# held-out hole-split eval of the cloth seed0 refresh (the r2 artifact
# reported train 88.5% / test 90.0%; keep both numbers current)
run=$(ls -d logs/r8_cloth_seed0/* 2>/dev/null | tail -1)
if [ -n "${run:-}" ]; then
  timeout 2400 python scripts/eval_breakdown.py --run-dir "$run" \
    --threshold 0.2 --save-distances --override env.kwargs.hole_split=test \
    --out docs/r8_cloth_seed0_testsplit_eval.json \
    >> docs/r8_cloth_seed0.log 2>&1
  echo "[r8:cloth_testsplit] eval rc=$? $(date)" >> "$LOG"
fi
