"""Run the training CLI pinned to the host CPU backend.

The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
start and IGNORES the JAX_PLATFORMS env var, so a plain
`JAX_PLATFORMS=cpu python -m geometry_rl_tpu.train.cli` still connects to
the (exclusive!) TPU relay and can collide with a live chip job. This
wrapper re-pins to CPU the way tests/conftest.py does, then dispatches to
the normal CLI.

Usage: python scripts/cpu_cli.py --config ... --override ...
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

from geometry_rl_tpu.train.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
