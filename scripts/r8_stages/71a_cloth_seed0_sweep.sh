# Checkpoint sweep of the cloth seed-0 HEAD refresh (round-5 regression
# adjudication): how much does eval success@0.2 move across the plateau
# checkpoints (iters 420-499 + best)? If the spread is large, the 53.3%
# best-checkpoint number is checkpoint-noise on a knife-edge threshold, not
# a point estimate.
run=$(ls -d logs/r8_cloth_seed0/* 2>/dev/null | tail -1)
if [ -n "${run:-}" ]; then
  timeout 2400 python -m geometry_rl_tpu.train.play --run-dir "$run" \
    --all-checkpoints --episodes-steps 400 --success-threshold 0.2 \
    > docs/r8_cloth_seed0_sweep.log 2>&1
  echo "[r8:cloth_seed0_sweep] rc=$? $(date)" >> "$LOG"
  cp "$run"/eval.json docs/r8_cloth_seed0_sweep.json 2>/dev/null
fi
