"""Shape generation and polygon SDF tests."""

import jax.numpy as jnp
import numpy as np

from geometry_rl_tpu.sim.shapes import (
    SHAPE_NAMES,
    SHAPE_OUTLINES,
    build_shape_set,
    ground_sdf,
    hole_plate_sdf,
    polygon_sdf_2d,
    prism_mesh,
)


def test_all_shapes_present():
    assert set(SHAPE_NAMES) <= set(SHAPE_OUTLINES.keys())
    assert len(SHAPE_NAMES) == 8
    for extra in ("A", "E", "L"):  # pushing/sliding extras
        assert extra in SHAPE_OUTLINES


def test_outlines_are_closed_and_nondegenerate():
    for name, o in SHAPE_OUTLINES.items():
        assert o.shape[0] >= 3, name
        # signed area (shoelace) nonzero and positive (CCW)
        x, y = o[:, 0], o[:, 1]
        area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        assert area > 0.01, (name, area)


def test_prism_mesh():
    pts, edges = prism_mesh(SHAPE_OUTLINES["hexagon"], 0.05)
    assert pts.shape == (12, 3)
    assert edges.shape == (18, 2)
    assert edges.max() < 12


def test_shape_set_padding():
    ss = build_shape_set(scale=0.1, half_height=0.05)
    S = len(SHAPE_NAMES)
    assert ss.points.shape[0] == S
    assert (np.asarray(ss.num_points) > 0).all()
    # masks match counts
    assert np.allclose(np.asarray(ss.point_mask).sum(-1), np.asarray(ss.num_points))
    assert np.allclose(np.asarray(ss.edge_mask).sum(-1), np.asarray(ss.num_edges))


def test_polygon_sdf_square():
    square = jnp.asarray([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]], jnp.float32)
    mask = jnp.ones(4)
    q = jnp.asarray([[0.0, 0.0], [2.0, 0.0], [0.0, 1.5], [0.5, 0.5], [1.0, 0.0]], jnp.float32)
    sdf = np.asarray(polygon_sdf_2d(q, square, mask))
    np.testing.assert_allclose(sdf, [-1.0, 1.0, 0.5, -0.5, 0.0], atol=1e-5)


def test_polygon_sdf_padded():
    """Padding with repeated vertices must not change the SDF."""
    square = np.asarray([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]], np.float32)
    padded = np.concatenate([square, np.tile(square[0], (3, 1))], axis=0)
    mask = np.asarray([1, 1, 1, 1, 0, 0, 0], np.float32)
    q = np.random.default_rng(0).uniform(-2, 2, size=(50, 2)).astype(np.float32)
    sdf_ref = np.asarray(polygon_sdf_2d(jnp.asarray(q), jnp.asarray(square), jnp.ones(4)))
    sdf_pad = np.asarray(polygon_sdf_2d(jnp.asarray(q), jnp.asarray(padded), jnp.asarray(mask)))
    np.testing.assert_allclose(sdf_pad, sdf_ref, atol=1e-5)


def test_polygon_sdf_all_shapes_center_inside():
    ss = build_shape_set(scale=0.1)
    for i, name in enumerate(SHAPE_NAMES):
        # a point at the centroid-ish: use outline mean
        o = np.asarray(ss.outline[i])
        m = np.asarray(ss.outline_mask[i]) > 0.5
        c = o[m].mean(0)
        sdf = float(polygon_sdf_2d(jnp.asarray(c), ss.outline[i], ss.outline_mask[i]))
        # heart/T centroids may lie near edges, but should be inside
        assert sdf < 0, (name, sdf)


def test_hole_plate_sdf():
    square = jnp.asarray([[0.1, 0.1], [-0.1, 0.1], [-0.1, -0.1], [0.1, -0.1]], jnp.float32)
    mask = jnp.ones(4)
    kw = dict(plate_half_extent=0.5, plate_top=0.05, plate_bottom=-0.05)

    pts = jnp.asarray(
        [
            [0.0, 0.0, 0.0],  # inside the hole -> outside solid
            [0.3, 0.0, 0.0],  # inside plate material
            [0.0, 0.0, 0.2],  # above plate
            [0.3, 0.0, 0.2],  # above plate material
            [0.9, 0.0, 0.0],  # outside plate extent
        ],
        jnp.float32,
    )
    phi, n = hole_plate_sdf(pts, square, mask, **kw)
    phi = np.asarray(phi)
    assert phi[0] > 0  # hole region is free space
    assert phi[1] < 0  # plate material
    assert phi[2] > 0 and phi[3] > 0
    assert phi[4] > 0
    # normal above the plate points up
    assert float(n[3, 2]) > 0.9


def test_hole_plate_peg_fits():
    """A peg outline fits through its own hole with clearance but collides
    when offset laterally."""
    ss_peg = build_shape_set(scale=0.1)
    ss_hole = build_shape_set(scale=0.1, clearance=0.08)
    i = SHAPE_NAMES.index("hexagon")
    kw = dict(plate_half_extent=0.5, plate_top=0.05, plate_bottom=-0.05)

    # peg surface points centered in the hole: all phi > 0 (no contact)
    pts = ss_peg.surface_points[i]
    phi, _ = hole_plate_sdf(pts, ss_hole.outline[i], ss_hole.outline_mask[i], **kw)
    # no strict penetration (boundary points at the plate's top plane sit at 0)
    assert float(jnp.min(phi)) >= -1e-6

    # offset peg: some points penetrate the plate
    pts_off = pts + jnp.asarray([0.05, 0.0, 0.0])
    phi_off, _ = hole_plate_sdf(pts_off, ss_hole.outline[i], ss_hole.outline_mask[i], **kw)
    assert float(jnp.min(phi_off)) < -1e-4


def test_ground_sdf():
    pts = jnp.asarray([[0.0, 0.0, 0.5], [0.0, 0.0, -0.1]])
    phi, n = ground_sdf(pts)
    np.testing.assert_allclose(np.asarray(phi), [0.5, -0.1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[:, 2]), 1.0)
