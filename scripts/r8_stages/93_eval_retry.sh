# Sweep: re-run any eval that was lost to a relay stall earlier in the day.
# Threshold per family: cloth 0.2, everything else 0.1.
for d in logs/r8_*; do
  [ -d "$d" ] || continue
  name=$(basename "$d"); name=${name#r8_}
  # diagnostic probes are trajectory-only (docs/KL_PPO_NOTES.md) — no eval
  case "$name" in kl_ppo_r5recipe|kl_ppo_schulman) continue;; esac
  [ -f "docs/r8_${name}_eval.json" ] && continue
  run=$(ls -d "$d"/* 2>/dev/null | tail -1)
  [ -z "${run:-}" ] && continue
  thr=0.1; case "$name" in cloth*) thr=0.2;; esac
  echo "[r8:eval_retry] $name start $(date)" >> "$LOG"
  timeout 2400 python scripts/eval_breakdown.py --run-dir "$run" \
    --threshold "$thr" --save-distances --out "docs/r8_${name}_eval.json" \
    >> "docs/r8_${name}.log" 2>&1
  echo "[r8:eval_retry] $name rc=$? $(date)" >> "$LOG"
  mkdir -p "docs/runs/r8_$name"
  cp "$run"/metrics.jsonl "$run"/hparams.json "docs/runs/r8_$name/" 2>/dev/null
done
