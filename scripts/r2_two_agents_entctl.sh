#!/bin/bash
# Two-agents stability experiment: same reference-parity config PLUS TRPL
# entropy control (exp-decay equality projection) to stop the post-
# convergence entropy inflation -> KL blowups seen in docs/runs/r2_two_agents.
set -u
cd /root/repo
echo "[entctl] start $(date)" >> docs/r2_queue.log
timeout 5400 python -m geometry_rl_tpu.train.cli \
  --config rigid_insertion_two_agents_multi_hepi_trpl \
  --override logger.log_dir=logs/r3_two_agents_entctl \
    logger.checkpoint.save_interval=25 \
    algorithm.projection.entropy_schedule=exp \
    algorithm.projection.entropy_eq=true \
    algorithm.projection.target_entropy=0.0 \
  > docs/two_agents_entctl.log 2>&1
rc=$?
echo "[entctl] train rc=$rc" >> docs/r2_queue.log
if [ "$rc" -eq 0 ]; then
  run=$(ls -d logs/r3_two_agents_entctl/* | tail -1)
  timeout 1800 python scripts/eval_breakdown.py --run-dir "$run" \
    --out docs/runs_two_agents_entctl_eval.json >> docs/two_agents_entctl.log 2>&1
  echo "[entctl] eval rc=$? run=$run" >> docs/r2_queue.log
fi
echo "[entctl] done $(date)" >> docs/r2_queue.log
