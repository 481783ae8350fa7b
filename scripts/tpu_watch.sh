#!/bin/bash
# Poll for the axon relay (:8083) to recover, then verify the TPU backend
# actually initializes, then run the round-3 TPU queue. One real chip —
# everything downstream is sequential (scripts/r3_queue.sh).
set -u
cd /root/repo
LOG=docs/tpu_watch.log
echo "[watch] start $(date)" >> "$LOG"
while true; do
  if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    echo "[watch] port 8083 open $(date)" >> "$LOG"
    # Port open != backend healthy; require a real device list.
    if timeout 300 python -c "import jax; d=jax.devices(); assert d, d; print(d)" >> "$LOG" 2>&1; then
      # free the single CPU: a concurrent CPU training starves the TPU
      # client's dispatch loop (observed round 2)
      if [ -f /tmp/cpu_entctl.pid ] && kill -0 "$(cat /tmp/cpu_entctl.pid)" 2>/dev/null; then
        echo "[watch] stopping CPU entctl run $(cat /tmp/cpu_entctl.pid)" >> "$LOG"
        kill "$(cat /tmp/cpu_entctl.pid)"
      fi
      echo "[watch] TPU backend healthy $(date) — launching r3 queue" >> "$LOG"
      bash scripts/r3_queue.sh >> "$LOG" 2>&1
      echo "[watch] r3 queue finished rc=$? $(date)" >> "$LOG"
      exit 0
    fi
    echo "[watch] port open but backend init failed; retrying in 120s" >> "$LOG"
    sleep 120
  else
    sleep 60
  fi
done
