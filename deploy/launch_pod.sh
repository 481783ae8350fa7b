#!/usr/bin/env bash
# Launch one training run on every host of a Cloud TPU pod slice
# (multi-host scale-out over DCN; within a host the env axis shards over
# the slice's chips via parallel/mesh.py).
#
#   deploy/launch_pod.sh [--dry-run] <tpu-name> <zone> <config-name> [overrides...]
#
# --dry-run (or DRY_RUN=1) prints the gcloud command instead of executing it,
# so CI can smoke-test argument handling without a pod.
# Requires the repo synced to each worker (e.g. gcloud ... scp --recurse).
set -euo pipefail
DRY_RUN="${DRY_RUN:-0}"
if [ "${1:-}" = "--dry-run" ]; then DRY_RUN=1; shift; fi
TPU="${1:?usage: launch_pod.sh [--dry-run] <tpu-name> <zone> <config> [overrides...]}"
ZONE="${2:?zone}"
CONFIG="${3:?config}"
shift 3 || true

# NOTE: point logger.log_dir at a SHARED filesystem (gs:// bucket or NFS) —
# checkpoint saves are collective and every host writes its array shards
# under the same run dir; local per-host paths would scatter the checkpoint.
#
# GEOMRL_MULTIHOST=1 makes the CLI call jax.distributed.initialize() (topology
# auto-discovered from TPU metadata) so all hosts form ONE SPMD program: the
# env axis shards over the slice's global mesh (parallel/multihost.py), rank 0
# owns logging, and orbax checkpoint saves are collective.
REMOTE="cd ~/geometry_rl_tpu && GEOMRL_MULTIHOST=1 python -m geometry_rl_tpu.train.cli --config $CONFIG ${*:+--override $*}"
CMD=(gcloud compute tpus tpu-vm ssh "$TPU" --zone "$ZONE" --worker=all --command "$REMOTE")
if [ "$DRY_RUN" = "1" ]; then
  echo "DRY-RUN: ${CMD[*]}"
  exit 0
fi
exec "${CMD[@]}"
