#!/bin/bash
# Round-5 queue takeover: the 04:48 runner instance has R8_DEADLINE=08:45,
# far short of the ~18:45 round end. Its loop PID is given as $1 and has
# already been killed by the caller; this script waits for the in-flight
# stage subshell ($2, stage 68_pushing_empn) to finish train+eval, marks the
# stage done (the dead runner can no longer write the marker), then starts a
# fresh runner with the full-round deadline.
set -u
cd /root/repo
STAGE_PID="${1:?stage subshell pid}"
STAGE_NAME="${2:?stage name}"
DEADLINE="${3:?epoch deadline}"
while kill -0 "$STAGE_PID" 2>/dev/null; do sleep 60; done
touch "docs/r8_done/$STAGE_NAME"
echo "[r9] takeover: $STAGE_NAME finished, marker written $(date)" >> docs/r8_queue.log
R8_DEADLINE="$DEADLINE" nohup bash scripts/r8_runner.sh >> docs/r8_queue.log 2>&1 &
echo $! > /tmp/r8_runner.pid
