#!/bin/bash
# Repeat-run the 2-process Gloo multihost test to bound its flake rate
# (docs/MULTIHOST_FLAKE.md). Usage: bash scripts/stress_multihost.sh [N]
set -u
cd /root/repo
N="${1:-20}"
pass=0
for i in $(seq 1 "$N"); do
  if timeout 1200 python -m pytest tests/test_multihost.py -x -q \
      >> docs/stress_multihost.log 2>&1; then
    pass=$((pass + 1))
    echo "[stress_multihost] run $i/$N PASS ($(date -u +%H:%M))" >> docs/stress_multihost.log
  else
    echo "[stress_multihost] run $i/$N FAIL ($(date -u +%H:%M))" >> docs/stress_multihost.log
  fi
done
echo "[stress_multihost] $pass/$N passed" >> docs/stress_multihost.log
