"""Full-covariance projection variants (kl_projection_layer.py:114-159,
:264-307; w2_projection_layer_non_com.py:14-98).

Validated three ways: diagonal inputs must reproduce the diagonal solver,
constraints must hold for random SPD batches, and small instances are
cross-checked against direct scipy primal optimization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometry_rl_tpu.rl.projections.fullcov import (
    FullCovKLProjection,
    FullCovW2NonCommutingProjection,
    kl_cov_part_full,
    kl_full_cov_projection,
    kl_full_joint_projection,
    kl_full_parts,
    w2_non_commutative_parts,
    w2_non_commutative_projection,
)
from geometry_rl_tpu.rl.projections.kl import kl_diag_cov_projection


def rand_spd(key, batch, k, scale=1.0):
    a = jax.random.normal(key, (batch, k, k)) * scale
    return a @ jnp.swapaxes(a, -1, -2) + 0.3 * jnp.eye(k)


@pytest.fixture(scope="module")
def mats():
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    B, K = 16, 4
    cov = rand_spd(keys[0], B, K)
    old_cov = rand_spd(keys[1], B, K)
    mean = jax.random.normal(keys[2], (B, K))
    old_mean = jax.random.normal(keys[3], (B, K))
    return mean, cov, old_mean, old_cov


def test_full_cov_projection_satisfies_bound(mats):
    _, cov, _, old_cov = mats
    eps = 0.01
    proj = kl_full_cov_projection(cov, old_cov, eps)
    c = kl_cov_part_full(proj, old_cov)
    assert np.all(np.asarray(c) <= eps * (1 + 1e-3) + 1e-6)


def test_full_cov_projection_noop_inside_bound(mats):
    _, cov, _, _ = mats
    proj = kl_full_cov_projection(cov, 1.001 * cov, 10.0)  # already inside
    np.testing.assert_allclose(np.asarray(proj), np.asarray(cov), rtol=1e-6)


def test_full_cov_matches_diag_solver(mats):
    """On diagonal inputs the full solver must agree with kl.py's diag one."""
    key = jax.random.PRNGKey(3)
    var = jax.random.uniform(key, (8, 5), minval=0.1, maxval=2.0)
    old_var = jax.random.uniform(jax.random.fold_in(key, 1), (8, 5), minval=0.1, maxval=2.0)
    eps = 0.005
    diag_proj = kl_diag_cov_projection(var, old_var, eps)
    full_proj = kl_full_cov_projection(
        jax.vmap(jnp.diag)(var), jax.vmap(jnp.diag)(old_var), eps
    )
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(full_proj, axis1=-2, axis2=-1)),
        np.asarray(diag_proj),
        rtol=1e-4,
        atol=1e-6,
    )
    # off-diagonals stay (numerically) zero
    off = full_proj - jax.vmap(jnp.diag)(jnp.diagonal(full_proj, axis1=-2, axis2=-1))
    assert float(jnp.abs(off).max()) < 1e-5


def test_full_cov_projection_optimality_vs_scipy():
    """The dual solve must match direct primal optimization (2x2 case)."""
    from scipy.optimize import minimize

    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 2))
    cov = a @ a.T + 0.3 * np.eye(2)
    b = rng.normal(size=(2, 2))
    old_cov = b @ b.T + 0.3 * np.eye(2)
    eps = 0.02

    proj = np.asarray(kl_full_cov_projection(cov[None], old_cov[None], eps)[0])

    def kl_cov(s, ref):
        return 0.5 * (
            np.trace(np.linalg.solve(ref, s)) - 2 + np.log(np.linalg.det(ref)) - np.log(np.linalg.det(s))
        )

    def primal(x):  # parameterize via lower-triangular Cholesky
        L = np.array([[x[0], 0.0], [x[1], x[2]]])
        s = L @ L.T
        return kl_cov(s, cov) + 1e4 * max(0.0, kl_cov(s, old_cov) - eps) ** 2

    L0 = np.linalg.cholesky(old_cov)
    res = minimize(primal, [L0[0, 0], L0[1, 0], L0[1, 1]], method="Nelder-Mead",
                   options={"xatol": 1e-10, "fatol": 1e-12, "maxiter": 20000})
    L = np.array([[res.x[0], 0.0], [res.x[1], res.x[2]]])
    s_scipy = L @ L.T
    np.testing.assert_allclose(proj, s_scipy, rtol=2e-2, atol=2e-3)
    assert kl_cov(proj, old_cov) <= eps * 1.01


def test_full_cov_projection_gradients_finite(mats):
    _, cov, _, old_cov = mats

    def loss(c):
        return jnp.sum(kl_full_cov_projection(c, old_cov, 0.01) ** 2)

    g = jax.grad(loss)(cov)
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient flows only to the new covariance
    g_old = jax.grad(lambda oc: jnp.sum(kl_full_cov_projection(cov, oc, 0.01)))(old_cov)
    np.testing.assert_allclose(np.asarray(g_old), 0.0, atol=1e-12)


def test_full_cov_gradient_identity_when_inactive():
    key = jax.random.PRNGKey(11)
    cov = rand_spd(key, 4, 3)

    def f(c):
        return jnp.sum(kl_full_cov_projection(c, 1.02 * cov, 100.0) * 0.5)

    g = jax.grad(f)(cov)
    np.testing.assert_allclose(np.asarray(g), 0.5, atol=1e-6)


def test_joint_projection_satisfies_total_bound(mats):
    mean, cov, old_mean, old_cov = mats
    eps = 0.05
    pm, pc = kl_full_joint_projection(mean, cov, old_mean, old_cov, eps)
    m, c = kl_full_parts(pm, pc, old_mean, old_cov)
    assert np.all(np.asarray(m + c) <= eps * (1 + 1e-3) + 1e-6)


def test_joint_projection_noop_inside_bound(mats):
    mean, cov, _, _ = mats
    pm, pc = kl_full_joint_projection(mean, cov, mean + 1e-4, 1.001 * cov, 10.0)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(mean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pc), np.asarray(cov), rtol=1e-6)


def test_joint_projection_gradients_finite(mats):
    mean, cov, old_mean, old_cov = mats

    def loss(m, c):
        pm, pc = kl_full_joint_projection(m, c, old_mean, old_cov, 0.05)
        return jnp.sum(pm**2) + jnp.sum(pc**2)

    gm, gc = jax.grad(loss, argnums=(0, 1))(mean, cov)
    assert np.all(np.isfinite(np.asarray(gm))) and np.all(np.isfinite(np.asarray(gc)))


def test_w2_non_com_parts_match_diag_w2():
    """On commuting (diagonal) inputs the non-commutative parts reduce to the
    commutative diagonal formulas used by WassersteinProjection."""
    from geometry_rl_tpu.rl.gaussian import DiagGaussian, wasserstein_parts

    key = jax.random.PRNGKey(5)
    std = jax.random.uniform(key, (6, 3), minval=0.5, maxval=1.5)
    old_std = jax.random.uniform(jax.random.fold_in(key, 1), (6, 3), minval=0.5, maxval=1.5)
    mean = jax.random.normal(jax.random.fold_in(key, 2), (6, 3))
    old_mean = jax.random.normal(jax.random.fold_in(key, 3), (6, 3))

    mp_d, cp_d = wasserstein_parts(DiagGaussian(mean, std), DiagGaussian(old_mean, old_std), scale_prec=False)
    mp_f, cp_f = w2_non_commutative_parts(
        mean, jax.vmap(jnp.diag)(std), old_mean, jax.vmap(jnp.diag)(old_std), scale_prec=False
    )
    np.testing.assert_allclose(np.asarray(mp_f), np.asarray(mp_d), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cp_f), np.asarray(cp_d), rtol=1e-4, atol=1e-5)


def test_w2_non_com_projection_satisfies_bound(mats):
    mean, cov, old_mean, old_cov = mats
    sqrt = jnp.linalg.cholesky(cov) @ jnp.swapaxes(jnp.linalg.cholesky(cov), -1, -2)
    # symmetric PSD sqrts via eigh
    from geometry_rl_tpu.rl.projections.fullcov import _sqrt_psd

    sqrt, old_sqrt = _sqrt_psd(cov), _sqrt_psd(old_cov)
    eps = 0.5
    pm, ps = w2_non_commutative_projection(mean, sqrt, old_mean, old_sqrt, eps)
    mp, cp = w2_non_commutative_parts(pm, ps, old_mean, old_sqrt)
    # geodesic scaling is exact for the cov part and conservative overall
    assert np.all(np.asarray(mp + cp) <= eps * 1.1 + 1e-5)


def test_w2_non_com_projection_noop_inside_bound(mats):
    mean, cov, _, _ = mats
    from geometry_rl_tpu.rl.projections.fullcov import _sqrt_psd

    sqrt = _sqrt_psd(cov)
    pm, ps = w2_non_commutative_projection(mean, sqrt, mean, sqrt, 10.0)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(mean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(sqrt), rtol=1e-6)


def test_layer_wrappers(mats):
    mean, cov, old_mean, old_cov = mats
    from geometry_rl_tpu.rl.projections.fullcov import _sqrt_psd

    pm, pc = FullCovKLProjection(mean_bound=0.01, cov_bound=0.005)(mean, cov, old_mean, old_cov)
    m, c = kl_full_parts(pm, pc, old_mean, old_cov)
    assert np.all(np.asarray(m) <= 0.01 * 1.01 + 1e-6)
    assert np.all(np.asarray(c) <= 0.005 * 1.01 + 1e-6)

    pm2, ps2 = FullCovW2NonCommutingProjection(mean_bound=0.3, cov_bound=0.2)(
        mean, _sqrt_psd(cov), old_mean, _sqrt_psd(old_cov)
    )
    assert np.all(np.isfinite(np.asarray(pm2))) and np.all(np.isfinite(np.asarray(ps2)))
