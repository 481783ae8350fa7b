# held-out hole-split evals of the HEAD cloth refreshes (the r2 artifact
# reported train 88.5% / test 90.0%; keep the train/test consistency story
# current for the re-baseline): seed 0 plus the best HEAD draw (seed 3).
for name in cloth_seed0 cloth_seed3; do
  run=$(ls -d logs/r8_$name/* 2>/dev/null | tail -1)
  [ -z "${run:-}" ] && continue
  timeout 2400 python scripts/eval_breakdown.py --run-dir "$run" \
    --threshold 0.2 --save-distances --override env.kwargs.hole_split=test \
    --out "docs/r8_${name}_testsplit_eval.json" \
    >> "docs/r8_${name}.log" 2>&1
  echo "[r8:cloth_testsplit] $name eval rc=$? $(date)" >> "$LOG"
done
