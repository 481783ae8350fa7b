#!/bin/bash
# Round-3 main TPU queue (VERDICT items 2, 4, 5, 9) — strictly serial, the
# axon relay is exclusive. Each stage: train -> eval_breakdown -> copy
# artifacts into docs/ (reset-proof). Stages are independent: a failure
# logs and moves on.
#
#   1. HEPi rigid_insertion flagship 20.48M (scoreboard refresh + BC source)
#   2. BC end-to-end from the flagship best checkpoint -> docs/bc_insertion.json
#   3. EMPN rigid_insertion 20M      (paper's central comparison, ref budget)
#   4. Transformer rigid_insertion 20M
#   5. EMPN cloth_hanging 5M
#   6. Transformer cloth_hanging 5M
#   7. kl_ppo rigid_insertion 20M    (algorithm-family capability artifact)
#   8. ppo rigid_insertion 20M
set -u
cd /root/repo
LOG=docs/r5_queue.log

# Hard deadline (epoch seconds): no NEW stage starts after this, so the chip
# is free for the driver's end-of-round bench. Override via R5_DEADLINE.
DEADLINE="${R5_DEADLINE:-$(date -d '2026-08-19 21:15 UTC' +%s)}"

run_train_eval() {
  # name cfg total_frames timeout threshold extra_overrides...
  local name=$1 cfg=$2 frames=$3 tmo=$4 thr=$5; shift 5
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[r5:$name] SKIP past deadline $(date)" >> "$LOG"
    return 0
  fi
  echo "[r5:$name] train start $(date)" >> "$LOG"
  timeout "$tmo" python -m geometry_rl_tpu.train.cli \
    --config "$cfg" \
    --override "logger.log_dir=logs/r5_$name" \
      logger.checkpoint.save_interval=20 \
      "collector.total_frames=$frames" "$@" \
    > "docs/r5_${name}.log" 2>&1
  local rc=$?
  echo "[r5:$name] train rc=$rc $(date)" >> "$LOG"
  if [ "$rc" -ne 0 ]; then return "$rc"; fi
  local run
  run=$(ls -d logs/r5_$name/* | tail -1)
  timeout 2400 python scripts/eval_breakdown.py --run-dir "$run" \
    --threshold "$thr" --out "docs/r5_${name}_eval.json" \
    >> "docs/r5_${name}.log" 2>&1
  echo "[r5:$name] eval rc=$? run=$run" >> "$LOG"
  mkdir -p "docs/runs/r5_$name"
  cp "$run"/metrics.jsonl "docs/runs/r5_$name/" 2>/dev/null
  cp "$run"/hparams.json "docs/runs/r5_$name/" 2>/dev/null
}

# 1. HEPi insertion flagship (r1_final recipe, shipped code)
run_train_eval hepi_insertion rigid_insertion_multi_hepi_trpl 20480000 5400 0.1 \
  env.num_envs=1024 env.kwargs.warmup_steps=0 collector.frames_per_batch=102400

# 2. BC end-to-end from the flagship best checkpoint
ckpt=$(ls -d logs/r5_hepi_insertion/*/best 2>/dev/null | tail -1)
if [ -n "${ckpt:-}" ]; then
  echo "[r5:bc] start ckpt=$ckpt $(date)" >> "$LOG"
  timeout 3000 python -m geometry_rl_tpu.train.bc_cli \
    --config rigid_insertion_multi_hepi_trpl \
    --override env.num_envs=1024 env.kwargs.warmup_steps=0 \
      collector.frames_per_batch=102400 \
    --checkpoint "$ckpt" --record-steps 200 --epochs 50 \
    --eval-steps 400 --success-threshold 0.1 \
    --out-dir logs/r5_bc_insertion > docs/r5_bc_insertion.log 2>&1
  echo "[r5:bc] rc=$? $(date)" >> "$LOG"
  cp logs/r5_bc_insertion/bc_history.json docs/bc_insertion.json 2>/dev/null
else
  echo "[r5:bc] SKIP no flagship checkpoint $(date)" >> "$LOG"
fi

# 3-6. baseline models at the reference budgets
run_train_eval empn_insertion rigid_insertion_multi_empn_trpl 20000000 7000 0.1
run_train_eval transformer_insertion rigid_insertion_multi_transformer_trpl 20000000 7000 0.1
run_train_eval empn_cloth cloth_hanging_multi_empn_trpl 5000000 3600 0.2
run_train_eval transformer_cloth cloth_hanging_multi_transformer_trpl 5000000 3600 0.2

# 7-8. algorithm families at the flagship budget
run_train_eval kl_ppo_insertion rigid_insertion_multi_hepi_trpl 20480000 5400 0.1 \
  env.num_envs=1024 env.kwargs.warmup_steps=0 collector.frames_per_batch=102400 \
  algo=kl_ppo
run_train_eval ppo_insertion rigid_insertion_multi_hepi_trpl 20480000 5400 0.1 \
  env.num_envs=1024 env.kwargs.warmup_steps=0 collector.frames_per_batch=102400 \
  algo=ppo

echo "[r5] queue done $(date)" >> "$LOG"
