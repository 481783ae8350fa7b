"""Native host-runtime library tests (builds libgeomrl_native.so)."""

import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu import native
from geometry_rl_tpu.graphs.rigid import knn_edges_np
from geometry_rl_tpu.rl.projections import kl_diag_cov_projection
from geometry_rl_tpu.sim.shapes import polygon_sdf_2d

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE, reason="no native toolchain")


def test_knn_graph_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    e_native = native.knn_graph(pts, 20, 3)
    e_ref = knn_edges_np(pts, 20, 3)
    # same dst grouping and same neighbor SETS (ordering may differ on ties)
    assert e_native.shape == e_ref.shape
    for i in range(20):
        nat = set(e_native[e_native[:, 1] == i, 0].tolist())
        ref = set(e_ref[e_ref[:, 1] == i, 0].tolist())
        assert nat == ref, i


def test_knn_graph_batch():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(3, 16, 3)).astype(np.float32)
    counts = np.asarray([16, 10, 5], np.int32)
    src, dst, mask = native.knn_graph_batch(pts, counts, 3)
    assert src.shape == (3, 48)
    np.testing.assert_allclose(mask.sum(-1), counts * 3)
    # masked-off entries are zeros
    assert (src[2, int(counts[2] * 3) :] == 0).all()


def test_edges_from_faces():
    faces = np.asarray([[0, 1, 2], [1, 2, 3]], np.int32)
    edges = native.edges_from_faces(faces)
    expected = {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)}
    assert {tuple(e) for e in edges.tolist()} == expected


def test_native_kl_projection_matches_jax():
    rng = np.random.default_rng(2)
    var = np.exp(rng.normal(size=(32, 6))).astype(np.float32)
    old_var = np.exp(rng.normal(size=(32, 6))).astype(np.float32)
    eps = 0.0025
    native_out = native.diag_kl_project(var, old_var, eps)
    jax_out = np.asarray(kl_diag_cov_projection(jnp.asarray(var), jnp.asarray(old_var), eps))
    np.testing.assert_allclose(native_out, jax_out, rtol=2e-3, atol=1e-6)


def test_native_polygon_sdf_matches_jax():
    rng = np.random.default_rng(3)
    square = np.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], np.float32)
    q = rng.uniform(-2, 2, size=(64, 2)).astype(np.float32)
    native_out = native.polygon_sdf(square, q)
    jax_out = np.asarray(polygon_sdf_2d(jnp.asarray(q), jnp.asarray(square)))
    np.testing.assert_allclose(native_out, jax_out, atol=1e-5)
