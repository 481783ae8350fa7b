# Retry probes that died on a transient relay error (FailedPrecondition on
# first device transfer — stage 37, 23:45 UTC). Idempotent: skips any probe
# whose metrics already landed in docs/runs/.
probe_retry() {
  local name=$1; shift
  [ -s "docs/runs/r8_$name/metrics.jsonl" ] && return 0
  local dl="${R8_DEADLINE:-$(date -d '2026-08-21 03:50 UTC' +%s)}"
  local room=$(( dl - $(date +%s) - 2100 ))
  [ "$room" -lt 600 ] && { echo "[r8:$name-retry] SKIP: ${room}s left $(date)" >> "$LOG"; return 0; }
  while ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[r8:$name-retry] relay probe FAILED, parking 5 min $(date)" >> "$LOG"
    sleep 300
    [ "$(( dl - $(date +%s) - 2100 ))" -lt 600 ] && { echo "[r8:$name-retry] SKIP at deadline $(date)" >> "$LOG"; return 0; }
  done
  room=$(( dl - $(date +%s) - 2100 ))
  local tmo=2400; [ "$tmo" -gt "$room" ] && tmo=$room
  echo "[r8:$name-retry] train start (tmo=${tmo}s) $(date)" >> "$LOG"
  timeout "$tmo" python -m geometry_rl_tpu.train.cli \
    --config rigid_insertion_multi_hepi_trpl \
    --override "logger.log_dir=logs/r8_$name" \
      env.num_envs=1024 env.kwargs.warmup_steps=0 \
      collector.frames_per_batch=102400 collector.total_frames=7168000 \
      algo=kl_ppo \
      algorithm.policy.minimal_std=0.05 \
      algorithm.objective.clip_grad_norm=true \
      "$@" \
    >> "docs/r8_${name}.log" 2>&1
  echo "[r8:$name-retry] train rc=$? $(date)" >> "$LOG"
  local run
  run=$(ls -d logs/r8_$name/* 2>/dev/null | tail -1)
  [ -z "${run:-}" ] && return 0
  mkdir -p "docs/runs/r8_$name"
  cp "$run"/metrics.jsonl "$run"/hparams.json "docs/runs/r8_$name/" 2>/dev/null
}

probe_retry kl_ppo_r5recipe
probe_retry kl_ppo_schulman algorithm.objective.kl_beta_interval=iteration
