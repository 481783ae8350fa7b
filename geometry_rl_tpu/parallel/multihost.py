"""Multi-host (pod-slice) runtime initialization.

The reference is single-process/single-GPU (SURVEY.md §2.11); scale-out there
means SLURM array jobs of independent runs (docker/container.sh). TPU-native
scale-out is ONE SPMD program over every chip of a pod slice: each host runs
this same CLI, `jax.distributed.initialize` wires the hosts into one runtime,
and the env axis shards over the GLOBAL device mesh (parallel/mesh.py) so XLA
collectives ride ICI/DCN.

Launch modes:
- Cloud TPU pod VM (deploy/launch_pod.sh): set GEOMRL_MULTIHOST=1; JAX
  auto-discovers coordinator/process topology from the TPU metadata.
- Explicit (CPU/GPU clusters, tests): GEOMRL_COORDINATOR=host:port,
  GEOMRL_NUM_PROCESSES, GEOMRL_PROCESS_ID.

Verified end-to-end on 2 processes x 4 virtual CPU devices with Gloo
collectives (tests/test_multihost.py): one sharded train_iteration matches
the single-process 8-device run.
"""

from __future__ import annotations

import os

import jax


def maybe_initialize_distributed() -> bool:
    """Initialize the distributed runtime when this is one process of a
    multi-host launch; no-op (returns False) for single-process runs.

    MUST run before any JAX computation touches the backend (the local
    backend commits to single-process mode on first use).
    """
    coord = os.environ.get("GEOMRL_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["GEOMRL_NUM_PROCESSES"]),
            process_id=int(os.environ["GEOMRL_PROCESS_ID"]),
        )
        return True
    if os.environ.get("GEOMRL_MULTIHOST") == "1":
        jax.distributed.initialize()  # Cloud TPU: autodetect from metadata
        return True
    return False


def is_main_process() -> bool:
    """True on the process that should own logging/printing (rank 0)."""
    return jax.process_index() == 0
