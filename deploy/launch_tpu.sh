#!/usr/bin/env bash
# Launch a training run on a TPU VM (the container.sh start+enter+train role).
#
#   deploy/launch_tpu.sh [--dry-run] <config-name> [overrides...]
#
# --dry-run (or DRY_RUN=1) prints the command instead of executing it, so CI
# can smoke-test argument handling without hardware.
set -euo pipefail
DRY_RUN="${DRY_RUN:-0}"
if [ "${1:-}" = "--dry-run" ]; then DRY_RUN=1; shift; fi
CONFIG="${1:?usage: launch_tpu.sh [--dry-run] <config-name> [overrides...]}"
shift || true
export JAX_PLATFORMS="${JAX_PLATFORMS:-}"
CMD=(python -m geometry_rl_tpu.train.cli --config "$CONFIG")
if [ "$#" -gt 0 ]; then CMD+=(--override "$@"); fi
if [ "$DRY_RUN" = "1" ]; then
  echo "DRY-RUN: ${CMD[*]}"
  exit 0
fi
exec "${CMD[@]}"
