#!/bin/bash
# Round-3 TPU queue, stage 2 (chained after scripts/r3_queue.sh):
# algorithm-family learning evidence. The reference exposes three algorithm
# configs (configs/algorithm/{trpl,ppo,kl_ppo}.yaml); TRPL has flagship runs,
# so demonstrate the other two families actually LEARN (not just smoke-run)
# on rigid_insertion with the same budget as the model learn-checks.
set -u
cd /root/repo
LOG=docs/r3_queue.log
echo "[r3q2] start $(date)" >> "$LOG"

for algo in ppo kl_ppo; do
  timeout 7200 python scripts/learn_check.py --task rigid_insertion --model hepi \
    --algo "$algo" --num-envs 512 --iterations 40 \
    --out docs/learn_${algo}_rigid_insertion_r3.json \
    > docs/learn_${algo}_rigid_insertion_r3.log 2>&1
  echo "[r3q2] learn-check $algo rc=$?" >> "$LOG"
done
echo "[r3q2] done $(date)" >> "$LOG"
