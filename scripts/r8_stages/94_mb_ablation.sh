# MFU workload ablation (VERDICT item 7): minibatch/width scaling table
echo "[r8:mb_ablation] start $(date)" >> "$LOG"
timeout 1800 python scripts/profile_mb_ablation.py > docs/profile_mb_ablation.log 2>&1
echo "[r8:mb_ablation] rc=$? $(date)" >> "$LOG"
