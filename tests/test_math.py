import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu.utils import math as gm


def random_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_mul_identity(rng):
    q = random_quat(rng, (5,))
    ident = gm.quat_identity((5,))
    np.testing.assert_allclose(gm.quat_mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(gm.quat_mul(ident, q), q, atol=1e-6)


def test_quat_apply_matches_matrix(rng):
    q = random_quat(rng, (7,))
    v = rng.normal(size=(7, 3)).astype(np.float32)
    R = gm.quat_to_matrix(jnp.asarray(q))
    out1 = gm.quat_apply(jnp.asarray(q), jnp.asarray(v))
    out2 = jnp.einsum("bij,bj->bi", R, jnp.asarray(v))
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_quat_apply_inverse_roundtrip(rng):
    q = random_quat(rng, (7,))
    v = rng.normal(size=(7, 3)).astype(np.float32)
    out = gm.quat_inv_apply(jnp.asarray(q), gm.quat_apply(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_quat_from_euler_xyz_yaw_only():
    yaw = jnp.asarray(np.pi / 2, dtype=jnp.float32)
    q = gm.quat_from_euler_xyz(jnp.zeros(()), jnp.zeros(()), yaw)
    v = jnp.array([1.0, 0.0, 0.0])
    out = gm.quat_apply(q, v)
    np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-6)


def test_quat_error_magnitude(rng):
    axis = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    for angle in [0.0, 0.3, 1.5, np.pi - 0.01]:
        q1 = gm.quat_from_axis_angle(jnp.asarray(axis), jnp.asarray(angle, dtype=jnp.float32))
        q2 = gm.quat_identity()
        err = gm.quat_error_magnitude(q1, q2)
        np.testing.assert_allclose(err, angle, atol=1e-5)


def test_quat_error_double_cover(rng):
    q = random_quat(rng, (5,))
    err = gm.quat_error_magnitude(jnp.asarray(q), jnp.asarray(-q))
    np.testing.assert_allclose(err, 0.0, atol=1e-5)


def test_yaw_quat_preserves_yaw():
    q = gm.quat_from_euler_xyz(jnp.asarray(0.3), jnp.asarray(0.2), jnp.asarray(1.1))
    yq = gm.yaw_quat(q)
    v = jnp.array([1.0, 0.0, 0.0])
    out = gm.quat_apply(yq, v)
    # yaw-only rotation keeps z at 0; the angle equals 2*atan2(qz, qw)
    # (orbit `yaw_quat` semantics: zero the xy components and renormalize)
    np.testing.assert_allclose(out[2], 0.0, atol=1e-6)
    expected = 2.0 * float(jnp.arctan2(q[3], q[0]))
    assert abs(float(jnp.arctan2(out[1], out[0])) - expected) < 1e-5


def test_transform_points_roundtrip(rng):
    q = random_quat(rng, (4,))
    pos = rng.normal(size=(4, 3)).astype(np.float32)
    pts = rng.normal(size=(4, 10, 3)).astype(np.float32)
    world = gm.transform_points(jnp.asarray(pts), jnp.asarray(pos), jnp.asarray(q))
    local = gm.inverse_transform_points(world, jnp.asarray(pos), jnp.asarray(q))
    np.testing.assert_allclose(local, pts, atol=1e-5)


def test_quat_integrate_constant_omega():
    # integrating omega = (0,0,w) for t seconds yields yaw = w*t (small dt)
    q = gm.quat_identity()
    omega = jnp.array([0.0, 0.0, 1.0])
    dt = 1e-3
    for _ in range(100):
        q = gm.quat_integrate(q, omega, dt)
    v = gm.quat_apply(q, jnp.array([1.0, 0.0, 0.0]))
    angle = float(jnp.arctan2(v[1], v[0]))
    assert abs(angle - 0.1) < 1e-3


def test_fibonacci_lattice_unit_norm():
    for upper in (False, True):
        grid = gm.fibonacci_lattice(16, upper_hemisphere=upper)
        np.testing.assert_allclose(jnp.linalg.norm(grid, axis=-1), 1.0, atol=1e-5)
        if upper:
            assert (grid[:, 2] >= -1e-6).all()


def test_fibonacci_lattice_covers_sphere():
    grid = np.asarray(gm.fibonacci_lattice(64))
    # mean should be near zero for a full-sphere covering
    assert np.linalg.norm(grid.mean(0)) < 0.1


def test_s1_grid():
    g = gm.s1_grid(8)
    np.testing.assert_allclose(jnp.linalg.norm(g, axis=-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(g[0], [1.0, 0.0], atol=1e-6)


def test_sample_uniform_bounds():
    key = jax.random.PRNGKey(0)
    x = gm.sample_uniform(key, -2.0, 3.0, (1000,))
    assert float(x.min()) >= -2.0 and float(x.max()) < 3.0
    assert abs(float(x.mean()) - 0.5) < 0.2
