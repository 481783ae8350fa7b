#!/bin/bash
# Wait for the main round-3 queue to finish, then run the two-agents
# follow-up (sweep + optional continuation). Safe to leave running: exits
# after one firing, or at the deadline without firing.
set -u
cd /root/repo
DEADLINE="${R5_DEADLINE:-$(date -d '2026-08-19 21:00 UTC' +%s)}"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if grep -q "^\[r5\] queue done" docs/r5_queue.log 2>/dev/null; then
    R5_CONTINUE="${R5_CONTINUE:-1}" bash scripts/r5_two_agents_followup.sh
    exit 0
  fi
  sleep 60
done
echo "[r5-watch] deadline reached without queue-done" >> docs/r5_queue.log
