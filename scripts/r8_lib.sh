# Shared helpers for the round-4 chip queue (sourced by scripts/r8_stages/*).
# Strictly serial — the axon relay is exclusive (a second JAX client blocks
# in backend init). Every run: train -> eval_breakdown -> copy artifacts
# into docs/ (reset-proof: logs/ is wiped between rounds, docs/ survives).
LOG=docs/r8_queue.log

r8_train_eval() {
  # name cfg timeout threshold extra_overrides...
  local name=$1 cfg=$2 tmo=$3 thr=$4; shift 4
  # Clamp train time so the stage can never overrun the queue deadline into
  # the driver's end-of-round bench window (leave 35 min for eval + bench).
  local dl="${R8_DEADLINE:-$(date -d '2026-08-20 20:15 UTC' +%s)}"
  local room=$(( dl - $(date +%s) - 2100 ))
  if [ "$room" -lt 300 ]; then
    echo "[r8:$name] SKIP: only ${room}s left before deadline $(date)" >> "$LOG"
    return 0
  fi
  [ "$tmo" -gt "$room" ] && tmo=$room
  # Relay-stall gate: when the axon tunnel is wedged, a client blocks in
  # backend init using no CPU and the stage would burn its whole timeout
  # learning nothing (observed 10:14 UTC today; also r5 iter-167 stall).
  # Between stages no client is connected, so a cheap probe distinguishes
  # healthy (devices print within 2 min) from stalled; park in 5-min probe
  # cycles until it clears or the deadline nears.
  while ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    echo "[r8:$name] relay probe FAILED, parking 5 min $(date)" >> "$LOG"
    sleep 300
    if [ "$(( dl - $(date +%s) - 2100 ))" -lt 300 ]; then
      echo "[r8:$name] SKIP: relay still stalled at deadline $(date)" >> "$LOG"
      return 0
    fi
  done
  room=$(( dl - $(date +%s) - 2100 )); [ "$tmo" -gt "$room" ] && tmo=$room
  # One retry when the relay kills the client EARLY with a transient error
  # (observed: "remote_compile: response body closed" 4 min into
  # 70_cloth_seed2, 09:01 UTC; FailedPrecondition at stage 37). A long run
  # dying late keeps its checkpoints, so only early deaths retry.
  local attempt
  for attempt in 1 2; do
    local t0=$(date +%s)
    echo "[r8:$name] train start (tmo=${tmo}s, attempt $attempt) $(date)" >> "$LOG"
    timeout "$tmo" python -m geometry_rl_tpu.train.cli \
      --config "$cfg" \
      --override "logger.log_dir=logs/r8_$name" \
        logger.checkpoint.save_interval=20 "$@" \
      >> "docs/r8_${name}.log" 2>&1
    local rc=$?
    echo "[r8:$name] train rc=$rc $(date)" >> "$LOG"
    [ "$rc" -eq 0 ] && break
    [ $(( $(date +%s) - t0 )) -gt 900 ] && break
    grep -qE "JaxRuntimeError|INTERNAL|FailedPrecondition|DEADLINE_EXCEEDED|UNAVAILABLE" \
      "docs/r8_${name}.log" || break
    room=$(( dl - $(date +%s) - 2100 ))
    [ "$room" -lt 300 ] && break
    [ "$tmo" -gt "$room" ] && tmo=$room
    echo "[r8:$name] transient early failure, retrying $(date)" >> "$LOG"
  done
  local run
  run=$(ls -d logs/r8_$name/* 2>/dev/null | tail -1)
  [ -z "${run:-}" ] && { echo "[r8:$name] NO RUN DIR $(date)" >> "$LOG"; return 0; }
  timeout 2400 python scripts/eval_breakdown.py --run-dir "$run" \
    --threshold "$thr" --save-distances --out "docs/r8_${name}_eval.json" \
    >> "docs/r8_${name}.log" 2>&1
  echo "[r8:$name] eval rc=$? run=$run $(date)" >> "$LOG"
  mkdir -p "docs/runs/r8_$name"
  cp "$run"/metrics.jsonl "$run"/hparams.json "docs/runs/r8_$name/" 2>/dev/null
}

r8_ckpt_sweep() {
  # name  (all-checkpoints eval sweep on the last run of logs/r8_<name>)
  local name=$1
  local run
  run=$(ls -d logs/r8_$name/* 2>/dev/null | tail -1)
  [ -z "${run:-}" ] && return 0
  timeout 2400 python -m geometry_rl_tpu.train.play --run-dir "$run" \
    --all-checkpoints --episodes-steps 400 --success-threshold 0.1 \
    > "docs/r8_${name}_sweep.log" 2>&1
  echo "[r8:$name] sweep rc=$? $(date)" >> "$LOG"
  cp "$run"/eval.json "docs/r8_${name}_sweep.json" 2>/dev/null
}
