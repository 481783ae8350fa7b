"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on `xla_force_host_platform_device_count=8` CPU devices, exactly as
the driver's `dryrun_multichip` does.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the (slow-to-init,
# single-chip) axon TPU tunnel; unit tests must run on the virtual CPU mesh.
if not os.environ.get("GRT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start (env vars are ignored); re-pin to CPU after import.
if not os.environ.get("GRT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)


import pytest  # noqa: E402

_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_xla_cache_per_module(request):
    """XLA CPU's JIT compiler segfaults nondeterministically when the whole
    suite's compile cache accumulates (first seen round 1 at
    test_rope_trainer_end_to_end, round 2 at test_rope_graph_builder — the
    crash point moves as tests are added). Clearing the in-process jax
    caches at every module boundary bounds the accumulated state while
    keeping intra-module cache reuse."""
    mod = request.module.__name__
    if mod != _last_module[0]:
        _last_module[0] = mod
        jax.clear_caches()
    yield
