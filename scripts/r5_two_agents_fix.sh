#!/bin/bash
# Round-3 two-agents stability fix — from the MEASURED two-stage mechanism
# (docs/diag_two_agents_maxstd_spike.json, iters 61-66 of the max_std=2.0 run):
#
#   stage 1: contextual std on some (state, dim) pairs drifts below ~0.03 and
#            then collapses to the minimal_std=1e-5 floor within ONE update
#            phase (375 minibatch steps; sigma_old_min 0.04 -> 2.5e-5 between
#            iters 62 and 63).
#   stage 2: the trust-region penalty curvature ~1/sigma^2 ~ 1e10 explodes
#            actor gradients (3.9 -> 3.8e10), the mean head blows up to +-56,
#            and reward degrades for ~10 iterations.
#
# Fix components (each targets one measured link in the chain):
#   minimal_std=0.05   bounds the penalty stiffness at (dmu/0.05)^2. A first
#                      attempt with 0.01 ran 12 iters: the floor converts the
#                      1e12 catastrophic spikes into bounded ~300 per-sample
#                      outliers (one per ~1000-sample minibatch -> logged
#                      mean 0.29, still over the 0.1 bar). The measured mean
#                      wobble on floor states is dmu ~ 0.17, so floor 0.05
#                      puts the worst sample at ~6 and the logged mean at
#                      ~0.01. sigma >= 0.05 on a +-1-clamped velocity action
#                      is harmless (deterministic eval uses the mean).
#   max_std=1.2        kills the entropy-cheat (irrelevant dims inflating to
#                      sigma 1.7-2.6 >> the action clamp) so the entropy
#                      bonus keeps resisting collapse on the relevant dims.
#   clip_grad_norm     cuts the stage-2 explosion feedback; within the
#                      reference's own config space (objective/trpl.yaml:13-14
#                      defaults True; the task cfg's False is what lets a
#                      1e10 gradient through).
#
# Success bar (VERDICT item 1): no logged KL > 0.1 anywhere in the run AND
# best-ckpt eval >= 90.8% with min per-shape >= 75%.
set -u
cd /root/repo
LOG=docs/r5_queue.log
echo "[r5-2afix] start $(date)" >> "$LOG"

timeout 7000 python -m geometry_rl_tpu.train.cli \
  --config rigid_insertion_two_agents_multi_hepi_trpl \
  --override logger.log_dir=logs/r5_two_agents_fix \
    logger.checkpoint.save_interval=10 \
    collector.total_frames=15000000 \
    algorithm.policy.minimal_std=0.05 \
    algorithm.policy.max_std=1.2 \
    algorithm.objective.clip_grad_norm=true \
    algorithm.objective.max_grad_norm=1.0 \
  > docs/two_agents_fix_r5.log 2>&1
rc=$?
echo "[r5-2afix] train rc=$rc $(date)" >> "$LOG"
if [ "$rc" -eq 0 ]; then
  run=$(ls -d logs/r5_two_agents_fix/* | tail -1)
  timeout 1800 python scripts/eval_breakdown.py --run-dir "$run" \
    --out docs/runs_two_agents_fix_r5_eval.json \
    >> docs/two_agents_fix_r5.log 2>&1
  echo "[r5-2afix] eval rc=$? run=$run" >> "$LOG"
  mkdir -p docs/runs/r5_two_agents_fix
  cp "$run"/metrics.jsonl docs/runs/r5_two_agents_fix/ 2>/dev/null
  cp "$run"/hparams.json docs/runs/r5_two_agents_fix/ 2>/dev/null
fi
echo "[r5-2afix] done $(date)" >> "$LOG"

# chain the main round-3 chip queue (flagship scoreboard refresh, BC,
# baselines at reference budget, kl_ppo/ppo full budget)
exec bash scripts/r5_queue_main.sh
