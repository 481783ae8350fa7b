#!/bin/bash
# Round-2 TPU queue, part 2: baseline-model learning evidence (VERDICT #7).
set -u
cd /root/repo
echo "[queue2] start $(date)" >> docs/r2_queue.log

echo "[queue2] empn learn-check..." >> docs/r2_queue.log
timeout 7200 python scripts/learn_check.py --task rigid_insertion --model empn \
  --num-envs 512 --iterations 40 --out docs/learn_empn_insertion_r2.json \
  > docs/learn_empn_insertion_r2.log 2>&1
echo "[queue2] empn rc=$?" >> docs/r2_queue.log

echo "[queue2] transformer learn-check..." >> docs/r2_queue.log
timeout 7200 python scripts/learn_check.py --task rigid_insertion --model transformer \
  --num-envs 512 --iterations 40 --out docs/learn_transformer_insertion_r2.json \
  > docs/learn_transformer_insertion_r2.log 2>&1
echo "[queue2] transformer rc=$?" >> docs/r2_queue.log

echo "[queue2] bench..." >> docs/r2_queue.log
timeout 3600 python bench.py > docs/bench_r2_tpu.log 2>&1
echo "[queue2] bench rc=$?" >> docs/r2_queue.log
echo "[queue2] done $(date)" >> docs/r2_queue.log
