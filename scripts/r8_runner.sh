#!/bin/bash
# Round-4 chip queue runner. Executes scripts/r8_stages/*.sh in lexical
# order, strictly serially, marking completion in docs/r8_done/. Stages can
# be added/removed/reordered WHILE the runner is live (it re-globs before
# every pick), so mid-round findings (e.g. a kl_ppo fix run) can be slotted
# in without restarting. No fragile gates — the r6 queue died waiting on a
# log line that never appeared; this one starts immediately and logs every
# decision.
#
#   R8_DEADLINE  epoch seconds; no NEW stage starts after this so the chip
#                is free for the driver's end-of-round bench.
set -u
cd /root/repo
LOG=docs/r8_queue.log
DONE=docs/r8_done
mkdir -p "$DONE"
DEADLINE="${R8_DEADLINE:-$(date -d '2026-08-20 20:15 UTC' +%s)}"
echo "[r8] runner start $(date) deadline=$(date -u -d @"$DEADLINE")" >> "$LOG"

while :; do
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[r8] runner stop: past deadline $(date)" >> "$LOG"
    break
  fi
  next=""
  for s in scripts/r8_stages/*.sh; do
    [ -e "$s" ] || continue
    b=$(basename "$s" .sh)
    [ -f "$DONE/$b" ] && continue
    next=$s
    break
  done
  if [ -z "$next" ]; then
    # empty queue: poll for late-added stages until the deadline
    sleep 60
    continue
  fi
  b=$(basename "$next" .sh)
  echo "[r8] stage $b start $(date)" >> "$LOG"
  # shellcheck disable=SC1091
  ( source scripts/r8_lib.sh && source "$next" )
  echo "[r8] stage $b done rc=$? $(date)" >> "$LOG"
  touch "$DONE/$b"
done
echo "[r8] runner exit $(date)" >> "$LOG"
