# kl_ppo root-cause probes (VERDICT item 2, docs/KL_PPO_NOTES.md).
# Stage 35 measured the torchrl-default (no grad clip) failure mode: a
# relaxation oscillator — beta ramps 0.01 -> 1e5 within one iteration, the
# penalty-gradient spike (grad norm up to 6.5e4) poisons Adam's second
# moment, and the policy freezes (ESS=1.0000, KL=0) for ~40 iterations
# while v decays. These two 70-iter probes (7.168M frames each, no eval —
# the diagnostic is the trajectory) complete the story:
#   (a) the EXACT r5 recipe (clip_grad_norm + minimal_std=0.05) that
#       plateaued at -98 with KL in-band — now with beta/grad/KL-part
#       instrumentation, adjudicating where the in-band KL budget goes;
#   (b) same recipe but kl_beta_interval=iteration (Schulman 2017: one beta
#       adapt per update phase instead of per minibatch) — the candidate
#       mechanism fix. Success = (b) tracks clip-PPO through the -104
#       shelf where (a) stalls.
probe() {
  local name=$1; shift
  local dl="${R8_DEADLINE:-$(date -d '2026-08-21 03:50 UTC' +%s)}"
  local room=$(( dl - $(date +%s) - 2100 ))
  if [ "$room" -lt 600 ]; then
    echo "[r8:$name] SKIP: only ${room}s left $(date)" >> "$LOG"
    return 0
  fi
  # relay-stall gate (same as r8_lib.sh r8_train_eval): park while the axon
  # tunnel is wedged instead of burning the stage timeout blocked in init.
  while ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[r8:$name] relay probe FAILED, parking 5 min $(date)" >> "$LOG"
    sleep 300
    if [ "$(( dl - $(date +%s) - 2100 ))" -lt 600 ]; then
      echo "[r8:$name] SKIP: relay still stalled at deadline $(date)" >> "$LOG"
      return 0
    fi
  done
  room=$(( dl - $(date +%s) - 2100 ))
  local tmo=2400; [ "$tmo" -gt "$room" ] && tmo=$room
  echo "[r8:$name] train start (tmo=${tmo}s) $(date)" >> "$LOG"
  timeout "$tmo" python -m geometry_rl_tpu.train.cli \
    --config rigid_insertion_multi_hepi_trpl \
    --override "logger.log_dir=logs/r8_$name" \
      env.num_envs=1024 env.kwargs.warmup_steps=0 \
      collector.frames_per_batch=102400 collector.total_frames=7168000 \
      algo=kl_ppo \
      algorithm.policy.minimal_std=0.05 \
      algorithm.objective.clip_grad_norm=true \
      "$@" \
    > "docs/r8_${name}.log" 2>&1
  echo "[r8:$name] train rc=$? $(date)" >> "$LOG"
  local run
  run=$(ls -d logs/r8_$name/* 2>/dev/null | tail -1)
  [ -z "${run:-}" ] && return 0
  mkdir -p "docs/runs/r8_$name"
  cp "$run"/metrics.jsonl "$run"/hparams.json "docs/runs/r8_$name/" 2>/dev/null
}

probe kl_ppo_r5recipe
probe kl_ppo_schulman algorithm.objective.kl_beta_interval=iteration
