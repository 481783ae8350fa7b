#!/bin/bash
# Round-2 TPU job queue: runs sequentially on the single real chip.
# 1. rigid_sliding HEPi flagship (20M frames, reference scale) + per-shape eval
# 2. EMPN learn-check on rigid_insertion (~2M frames)
# 3. Transformer learn-check on rigid_insertion (~2M frames)
set -u
cd /root/repo

echo "[queue] start $(date)" >> docs/r2_queue.log

echo "[queue] rigid_sliding flagship..." >> docs/r2_queue.log
timeout 7200 python -m geometry_rl_tpu.train.cli \
  --config rigid_sliding_multi_hepi_trpl \
  --override logger.log_dir=logs/r3_sliding logger.checkpoint.save_interval=50 \
  > docs/flagship_sliding_r2.log 2>&1
echo "[queue] sliding rc=$?" >> docs/r2_queue.log

RUN_DIR=$(ls -dt logs/r3_sliding/*/ 2>/dev/null | head -1)
if [ -n "${RUN_DIR}" ]; then
  timeout 1800 python scripts/eval_breakdown.py --run-dir "${RUN_DIR}" \
    --checkpoint best --episodes 1 \
    > docs/eval_sliding_r2.log 2>&1
  echo "[queue] sliding eval rc=$?" >> docs/r2_queue.log
fi

echo "[queue] empn learn-check..." >> docs/r2_queue.log
timeout 7200 python scripts/learn_check.py --task rigid_insertion --model empn \
  --num-envs 512 --iterations 40 --out docs/learn_empn_insertion_r2.json \
  > docs/learn_empn_insertion_r2.log 2>&1
echo "[queue] empn rc=$?" >> docs/r2_queue.log

echo "[queue] transformer learn-check..." >> docs/r2_queue.log
timeout 7200 python scripts/learn_check.py --task rigid_insertion --model transformer \
  --num-envs 512 --iterations 40 --out docs/learn_transformer_insertion_r2.json \
  > docs/learn_transformer_insertion_r2.log 2>&1
echo "[queue] transformer rc=$?" >> docs/r2_queue.log

echo "[queue] done $(date)" >> docs/r2_queue.log
