#!/usr/bin/env bash
# Launch a training run on a TPU VM (the container.sh start+enter+train role).
set -euo pipefail
CONFIG="${1:?usage: launch_tpu.sh <config-name> [overrides...]}"
shift || true
export JAX_PLATFORMS="${JAX_PLATFORMS:-}"
exec python -m geometry_rl_tpu.train.cli --config "$CONFIG" ${1:+--override "$@"}
