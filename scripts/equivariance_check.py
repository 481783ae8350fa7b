import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Equivariance smoke demo — the reference's `ponita.py main()` (372-449)
equivalent: feed rotated copies of a toy graph through HEPi and print the
output vectors, which must be the rotations of each other.

    python scripts/equivariance_check.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from geometry_rl_tpu.graphs import EdgeSet, GraphFeatures, HeteroGraph, NodeSet
from geometry_rl_tpu.models import HEPi
from geometry_rl_tpu.utils import math as gm


def make_graph(pos, vec):
    B, N = pos.shape[:2]
    nodes = {
        "object_geometry": NodeSet(pos=pos, norm_pos=pos),
        "grippers": NodeSet(pos=pos[:, :1] * 0.0, norm_pos=pos[:, :1] * 0.0),
    }
    src = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    dst = jnp.broadcast_to((jnp.arange(N, dtype=jnp.int32) + 1) % N, (B, N))
    edges = {
        ("object_geometry", "internal", "object_geometry"): EdgeSet(src, dst, jnp.ones((B, N))),
        ("object_geometry", "task", "grippers"): EdgeSet(
            src, jnp.zeros((B, N), jnp.int32), jnp.ones((B, N))
        ),
    }
    feats = GraphFeatures(
        scalars={
            "object_geometry": jnp.ones((B, N, 1)),
            "grippers": jnp.ones((B, 1, 1)),
        },
        vectors={"object_geometry": vec, "grippers": jnp.zeros((B, 1, 1, 3))},
    )
    return HeteroGraph(nodes, edges, "grippers"), feats


def main():
    rng = np.random.default_rng(0)
    N = 6
    pos0 = jnp.asarray(rng.normal(size=(1, N, 3)).astype(np.float32))
    vec0 = jnp.asarray(rng.normal(size=(1, N, 1, 3)).astype(np.float32))

    grid = gm.fibonacci_lattice(12)
    model = HEPi(latent_dim=16, hidden_dim=16, output_dim=1, output_dim_vec=1, num_ori=12)
    g0, f0 = make_graph(pos0, vec0)
    params = model.init(jax.random.PRNGKey(0), g0, f0, ori_grid=grid)

    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    R = gm.quat_to_matrix(jnp.asarray(q))

    out0, _ = model.apply(params, g0, f0, ori_grid=grid)
    g1, f1 = make_graph(pos0 @ R.T, vec0 @ R.T)
    out1, _ = model.apply(params, g1, f1, ori_grid=jnp.asarray(grid @ R.T))

    print("output (original frame):   ", np.asarray(out0).reshape(-1))
    print("output (rotated, unrotated):", np.asarray(out1 @ R).reshape(-1))
    err = float(jnp.abs(out1 - out0 @ R.T).max())
    print(f"max equivariance error: {err:.2e}")
    assert err < 1e-3, "HEPi is not equivariant!"
    print("OK — HEPi output rotates exactly with the input frame.")


if __name__ == "__main__":
    main()
