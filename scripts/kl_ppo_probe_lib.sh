# Shared kl_ppo probe recipe (sourced by r8_stages/37 + 38). One body so the
# training invocation cannot drift between the first-attempt and retry
# stages (advisor round-4 finding). Lives OUTSIDE scripts/r8_stages/ because
# the runner executes every *.sh there as a stage.
#
#   kl_ppo_probe <name> [--idempotent] [extra_overrides...]
#
# --idempotent: skip when docs/runs/r8_<name>/metrics.jsonl already landed
# (the retry-stage pattern), and append to the log instead of truncating.
kl_ppo_probe() {
  local name=$1; shift
  local idem=0 tag="$name"
  if [ "${1:-}" = "--idempotent" ]; then
    idem=1; tag="$name-retry"; shift
  fi
  if [ "$idem" = 1 ] && [ -s "docs/runs/r8_$name/metrics.jsonl" ]; then
    return 0
  fi
  local dl="${R8_DEADLINE:-$(date -d '2026-08-21 03:50 UTC' +%s)}"
  local room=$(( dl - $(date +%s) - 2100 ))
  if [ "$room" -lt 600 ]; then
    echo "[r8:$tag] SKIP: only ${room}s left $(date)" >> "$LOG"
    return 0
  fi
  # relay-stall gate (same as r8_lib.sh r8_train_eval): park while the axon
  # tunnel is wedged instead of burning the stage timeout blocked in init.
  while ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[r8:$tag] relay probe FAILED, parking 5 min $(date)" >> "$LOG"
    sleep 300
    if [ "$(( dl - $(date +%s) - 2100 ))" -lt 600 ]; then
      echo "[r8:$tag] SKIP: relay still stalled at deadline $(date)" >> "$LOG"
      return 0
    fi
  done
  room=$(( dl - $(date +%s) - 2100 ))
  local tmo=2400; [ "$tmo" -gt "$room" ] && tmo=$room
  echo "[r8:$tag] train start (tmo=${tmo}s) $(date)" >> "$LOG"
  # first attempt truncates the probe log; a retry appends to it
  [ "$idem" = 0 ] && : > "docs/r8_${name}.log"
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
  echo "[r8:$tag] train rc=$? $(date)" >> "$LOG"
  local run
  run=$(ls -d logs/r8_$name/* 2>/dev/null | tail -1)
  [ -z "${run:-}" ] && return 0
  mkdir -p "docs/runs/r8_$name"
  cp "$run"/metrics.jsonl "$run"/hparams.json "docs/runs/r8_$name/" 2>/dev/null
}
