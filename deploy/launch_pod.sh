#!/usr/bin/env bash
# Launch one training run on every host of a Cloud TPU pod slice
# (multi-host scale-out over DCN; within a host the env axis shards over
# the slice's chips via parallel/mesh.py).
#
#   deploy/launch_pod.sh <tpu-name> <zone> <config-name> [overrides...]
#
# Requires the repo synced to each worker (e.g. gcloud ... scp --recurse).
set -euo pipefail
TPU="${1:?usage: launch_pod.sh <tpu-name> <zone> <config> [overrides...]}"
ZONE="${2:?zone}"
CONFIG="${3:?config}"
shift 3 || true

gcloud compute tpus tpu-vm ssh "$TPU" --zone "$ZONE" --worker=all --command \
  "cd ~/geometry_rl_tpu && python -m geometry_rl_tpu.train.cli --config $CONFIG ${*:+--override $*}"
