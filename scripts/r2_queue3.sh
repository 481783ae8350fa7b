#!/bin/bash
# Round-2 TPU queue, part 3: extend baseline-model learning evidence across
# the model x task matrix (EMPN + Transformer on cloth / pushing / two-agents;
# rigid_insertion was covered by queue part 2).
set -u
cd /root/repo
echo "[queue3] start $(date)" >> docs/r2_queue.log

for task in cloth_hanging rigid_pushing rigid_insertion_two_agents; do
  for model in empn transformer; do
    echo "[queue3] ${task} ${model} learn-check..." >> docs/r2_queue.log
    timeout 7200 python scripts/learn_check.py --task "$task" --model "$model" \
      --num-envs 512 --iterations 40 \
      --out "docs/learn_${model}_${task}_r2.json" \
      > "docs/learn_${model}_${task}_r2.log" 2>&1
    echo "[queue3] ${task} ${model} rc=$?" >> docs/r2_queue.log
  done
done
echo "[queue3] done $(date)" >> docs/r2_queue.log
