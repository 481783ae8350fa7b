"""Full-covariance trust-region projections — on-device XLA solves.

Completes the reference's non-diagonal projection family (the registered
policy family is diagonal — `policy_factory.py:28-31` — so nothing in the
training path consumes these; they exist for component parity and for users
bringing full-covariance Gaussians):

- `kl_full_cov_projection`: `BatchedCovOnlyProjection`
  (kl_projection_layer.py:114-159, ITPAL C++/NLopt). KKT stationarity for
      min_S KLcov(S || cov)  s.t.  KLcov(S || old_cov) <= eps
  gives the precision interpolation  S(eta)^-1 = (cov^-1 + eta*old_cov^-1)
  / (1 + eta)  [Otto et al. 2021], with the scalar dual eta solved by the
  same log-space bisection as the diagonal case (`kl.py`), batched over
  k x k matrices via Cholesky factorizations. Implicit differentiation via
  `lax.custom_root` (gradients to the NEW covariance only, matching
  ITPAL's backward — kl_projection_layer.py:195-204).

- `kl_full_joint_projection`: `BatchedProjection` (joint mean+cov,
  kl_projection_layer.py:264-307). Same single-multiplier dual over the
  TOTAL KL: mu*(eta) = (P + eta*P_old)^-1 (P mu + eta*P_old mu_old),
  S*(eta) as above, eta bisected on KL(p* || q) = eps. The reference's
  NLopt variant additionally couples an entropy inequality into the dual;
  here the entropy bound is applied by the layer template's entropy
  projection (base_projection_layer.py:232-273) — documented deviation.

- `w2_non_commutative_parts` / `w2_non_commutative_projection`:
  `WassersteinProjectionLayerNonCommuting` (w2_projection_layer_non_com.py:
  14-98). The reference eig-decomposes the NON-symmetric product
  `cov @ cov_other` with `torch.symeig(..., upper=False)` (reading only the
  lower triangle — projection_utils.py:196-204); we compute the eigenvalues
  of the similar SYMMETRIC matrix sqrt @ old_cov @ sqrt (same spectrum,
  numerically sound) and form the optimal-transport map
  W = sqrt @ c^{-1/2} @ sqrt from it.

Everything is pure XLA (no host callback), vmap/jit/grad-safe, and
validated in tests/test_fullcov.py against (a) the diagonal solver on
diagonal inputs and (b) scipy primal optimization on small instances.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

_BISECT_ITERS = 60
_ETA_MAX = 1e12


# ---------------------------------------------------------------------------
# shared batched k x k linear algebra helpers
# ---------------------------------------------------------------------------


def _chol_inverse(mat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(inverse, log-determinant) of a batched SPD matrix via Cholesky."""
    chol = jnp.linalg.cholesky(mat)
    k = mat.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(k, dtype=mat.dtype), mat.shape)
    inv = jax.scipy.linalg.cho_solve((chol, True), eye)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    return inv, logdet


def _sym(mat: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (mat + jnp.swapaxes(mat, -1, -2))


def _trace(mat: jnp.ndarray) -> jnp.ndarray:
    return jnp.trace(mat, axis1=-2, axis2=-1)


def kl_cov_part_full(cov: jnp.ndarray, old_cov: jnp.ndarray) -> jnp.ndarray:
    """0.5 [tr(old^-1 cov) - k + logdet(old) - logdet(cov)] (projection_utils
    gaussian_kl cov part, full-matrix form)."""
    k = cov.shape[-1]
    old_inv, old_logdet = _chol_inverse(old_cov)
    _, logdet = _chol_inverse(cov)
    return 0.5 * (jnp.einsum("...ij,...ji->...", old_inv, cov) - k + old_logdet - logdet)


def _bisect(constraint, batch_shape, dtype):
    """Log-space bisection on eta in [0, ETA_MAX]; constraint must be
    monotonically decreasing in eta with constraint(0) > 0."""
    lo = jnp.zeros(batch_shape, dtype)
    hi = jnp.full(batch_shape, _ETA_MAX, dtype)

    def body(_, carry):
        lo, hi = carry
        mid = jnp.expm1(0.5 * (jnp.log1p(lo) + jnp.log1p(hi)))
        gt = constraint(mid) > 0.0
        lo = jnp.where(gt, mid, lo)
        hi = jnp.where(gt, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    return 0.5 * (lo + hi)


def _scalar_tangent_solve(g, y):
    """custom_root tangent solve for a per-batch-element scalar root:
    diagonal linearization; guards the degenerate cov==old_cov case
    (zero derivative, output discarded by the `active` mask)."""
    denom = g(jnp.ones_like(y))
    tiny = jnp.abs(denom) < 1e-20
    return jnp.where(tiny, 0.0, y / jnp.where(tiny, 1.0, denom))


# ---------------------------------------------------------------------------
# cov-only projection (BatchedCovOnlyProjection)
# ---------------------------------------------------------------------------


def _interp_cov(prec: jnp.ndarray, old_prec: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """S(eta) = (1+eta) * (prec + eta*old_prec)^-1."""
    eta = eta[..., None, None]
    mix = (prec + eta * old_prec) / (1.0 + eta)
    inv, _ = _chol_inverse(_sym(mix))
    return _sym(inv)


def kl_full_cov_projection(cov: jnp.ndarray, old_cov: jnp.ndarray, eps) -> jnp.ndarray:
    """Project full covariances [..., k, k] into the KL-cov ball of radius
    eps around old_cov. Differentiable w.r.t. `cov` only (ITPAL backward
    semantics); non-finite solves fall back to old_cov
    (kl_projection_layer.py:73-74)."""
    old_cov = jax.lax.stop_gradient(old_cov)
    eps = jax.lax.stop_gradient(jnp.broadcast_to(jnp.asarray(eps, cov.dtype), cov.shape[:-2]))
    old_prec, old_logdet = _chol_inverse(old_cov)
    old_prec = jax.lax.stop_gradient(old_prec)

    c0 = kl_cov_part_full(jax.lax.stop_gradient(cov), old_cov)
    active = c0 > eps
    # inactive rows still go through the solver (so the batched solve has a
    # root everywhere and finite implicit gradients) against a dummy radius,
    # then get discarded by the final `where`
    eps_solver = jnp.where(active, eps, 0.5 * jnp.maximum(c0, 1e-12))

    def constraint(eta, prec):
        return kl_cov_part_full(_interp_cov(prec, old_prec, eta), old_cov) - eps_solver

    def solve(f, _x0):
        return _bisect(f, cov.shape[:-2], cov.dtype)

    prec, _ = _chol_inverse(cov)
    eta = jax.lax.custom_root(
        lambda eta: constraint(eta, prec),
        jnp.zeros(cov.shape[:-2], cov.dtype),
        solve,
        _scalar_tangent_solve,
    )
    proj = _interp_cov(prec, old_prec, eta)

    bad = ~jnp.all(jnp.isfinite(proj), axis=(-2, -1), keepdims=True)
    proj = jnp.where(bad, old_cov, proj)
    return jnp.where(active[..., None, None], proj, cov)


# ---------------------------------------------------------------------------
# joint mean+cov projection (BatchedProjection)
# ---------------------------------------------------------------------------


def kl_full_parts(mean, cov, old_mean, old_cov):
    """(mean part, cov part) of KL(p || q) for full Gaussians
    (projection_utils.py:34-67)."""
    old_inv, _ = _chol_inverse(old_cov)
    d = mean - old_mean
    maha = 0.5 * jnp.einsum("...i,...ij,...j->...", d, old_inv, d)
    return maha, kl_cov_part_full(cov, old_cov)


def kl_full_joint_projection(
    mean: jnp.ndarray, cov: jnp.ndarray, old_mean: jnp.ndarray, old_cov: jnp.ndarray, eps
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Joint projection onto the TOTAL-KL ball of radius eps
    (kl_projection_layer.py:264-307): single dual variable eta,
    mu*(eta) = (P + eta P_old)^-1 (P mu + eta P_old mu_old),
    S*(eta)^-1 = (P + eta P_old)/(1+eta). Differentiable w.r.t. mean/cov."""
    old_mean = jax.lax.stop_gradient(old_mean)
    old_cov = jax.lax.stop_gradient(old_cov)
    eps = jax.lax.stop_gradient(jnp.broadcast_to(jnp.asarray(eps, cov.dtype), cov.shape[:-2]))
    old_prec, _ = _chol_inverse(old_cov)

    def project(eta, mean, prec):
        e = eta[..., None, None]
        mix = prec + e * old_prec
        mix_inv, _ = _chol_inverse(_sym(mix))
        mu = jnp.einsum(
            "...ij,...j->...i",
            mix_inv,
            jnp.einsum("...ij,...j->...i", prec, mean)
            + eta[..., None] * jnp.einsum("...ij,...j->...i", old_prec, old_mean),
        )
        cov_p = _sym(mix_inv * (1.0 + e))
        return mu, cov_p

    m0, c0 = kl_full_parts(
        jax.lax.stop_gradient(mean), jax.lax.stop_gradient(cov), old_mean, old_cov
    )
    total0 = m0 + c0
    active = total0 > eps
    eps_solver = jnp.where(active, eps, 0.5 * jnp.maximum(total0, 1e-12))

    prec, _ = _chol_inverse(cov)

    def constraint(eta):
        mu, cov_p = project(eta, mean, prec)
        mp, cp = kl_full_parts(mu, cov_p, old_mean, old_cov)
        return mp + cp - eps_solver

    def solve(f, _x0):
        return _bisect(f, cov.shape[:-2], cov.dtype)

    eta = jax.lax.custom_root(
        constraint, jnp.zeros(cov.shape[:-2], cov.dtype), solve, _scalar_tangent_solve
    )
    proj_mean, proj_cov = project(eta, mean, prec)

    bad = (
        ~jnp.all(jnp.isfinite(proj_cov), axis=(-2, -1))
        | ~jnp.all(jnp.isfinite(proj_mean), axis=-1)
    )[..., None]
    proj_mean = jnp.where(bad, old_mean, proj_mean)
    proj_cov = jnp.where(bad[..., None], old_cov, proj_cov)
    am = active[..., None]
    return jnp.where(am, proj_mean, mean), jnp.where(am[..., None], proj_cov, cov)


# ---------------------------------------------------------------------------
# non-commutative Wasserstein-2 (w2_projection_layer_non_com.py)
# ---------------------------------------------------------------------------


def _inv_sqrt_psd(mat: jnp.ndarray) -> jnp.ndarray:
    """mat^{-1/2} of a batched symmetric PSD matrix via eigh."""
    vals, vecs = jnp.linalg.eigh(mat)
    inv_sqrt_vals = 1.0 / jnp.sqrt(jnp.maximum(vals, 1e-12))
    return jnp.einsum("...ik,...k,...jk->...ij", vecs, inv_sqrt_vals, vecs)


def _sqrt_psd(mat: jnp.ndarray) -> jnp.ndarray:
    vals, vecs = jnp.linalg.eigh(mat)
    sqrt_vals = jnp.sqrt(jnp.maximum(vals, 0.0))
    return jnp.einsum("...ik,...k,...jk->...ij", vecs, sqrt_vals, vecs)


def w2_non_commutative_parts(
    mean, sqrt, old_mean, old_sqrt, scale_prec: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean part, cov part) of W2 without assuming commuting covariances
    (projection_utils.py:152-209). sqrt/old_sqrt are symmetric PSD matrix
    square roots [..., k, k]."""
    cov = sqrt @ sqrt
    old_cov = old_sqrt @ old_sqrt
    if scale_prec:
        old_inv, _ = _chol_inverse(old_cov)
        d = mean - old_mean
        mean_part = jnp.einsum("...i,...ij,...j->...", d, old_inv, d)
        old_sqrt_inv = _inv_sqrt_psd(old_cov)
        c = _sym(old_sqrt_inv @ cov @ old_sqrt_inv)
        k = cov.shape[-1]
        vals = jnp.linalg.eigvalsh(c)
        cov_part = k + _trace(c) - 2.0 * jnp.sum(jnp.sqrt(jnp.maximum(vals, 0.0)), axis=-1)
    else:
        mean_part = jnp.sum((mean - old_mean) ** 2, axis=-1)
        # spectrum of cov @ old_cov == spectrum of sqrt @ old_cov @ sqrt (symmetric)
        c = _sym(sqrt @ old_cov @ sqrt)
        vals = jnp.linalg.eigvalsh(c)
        cov_part = _trace(cov) + _trace(old_cov) - 2.0 * jnp.sum(jnp.sqrt(jnp.maximum(vals, 0.0)), axis=-1)
    return mean_part, cov_part


def w2_non_commutative_projection(
    mean, sqrt, old_mean, old_sqrt, eps, scale_prec: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Geodesic W2 projection for non-commuting covariances
    (w2_projection_layer_non_com.py:38-92): joint bound eps on
    mean_part + cov_part, t = sqrt(eps / total), mean lerp, and covariance
    moved along the Bures-Wasserstein geodesic S_t = D old_cov D with
    D = (1-t) I + t W, W = sqrt @ (sqrt old_cov sqrt)^{-1/2} @ sqrt the
    optimal-transport map. Returns (proj_mean, proj_sqrt)."""
    mean_part, cov_part = w2_non_commutative_parts(mean, sqrt, old_mean, old_sqrt, scale_prec)
    total = mean_part + cov_part
    mask = total > eps
    t = jnp.where(mask, jnp.sqrt(eps / jnp.maximum(total, 1e-16)), 1.0)

    proj_mean = jnp.where(mask[..., None], (1.0 - t)[..., None] * old_mean + t[..., None] * mean, mean)

    old_cov = old_sqrt @ old_sqrt
    c = _sym(sqrt @ old_cov @ sqrt)
    w = sqrt @ _inv_sqrt_psd(c) @ sqrt
    k = sqrt.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(k, dtype=sqrt.dtype), sqrt.shape)
    d = (1.0 - t)[..., None, None] * eye + t[..., None, None] * w
    proj_sqrt = jnp.where(mask[..., None, None], _sqrt_psd(_sym(d @ old_cov @ d)), sqrt)
    return proj_mean, proj_sqrt


# ---------------------------------------------------------------------------
# layer wrappers (operate on (mean, cov) / (mean, sqrt) tuples)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FullCovKLProjection:
    """KLProjectionLayer for full covariances: closed-form mean projection
    (Mahalanobis ball, base_projection_layer.py:71-100) + the cov-only dual
    solve above. Not part of the Trainer path (diag policies only)."""

    mean_bound: float = 0.05
    cov_bound: float = 1e-3

    def __call__(self, mean, cov, old_mean, old_cov):
        old_inv, _ = _chol_inverse(old_cov)
        d = mean - old_mean
        maha = 0.5 * jnp.einsum("...i,...ij,...j->...", d, old_inv, d)
        mask = maha > self.mean_bound
        omega = jnp.abs(jnp.sqrt(jnp.maximum(maha, 1e-16) / self.mean_bound) - 1.0)[..., None]
        interp = (mean + omega * old_mean) / (1.0 + omega + 1e-16)
        proj_mean = jnp.where(mask[..., None], interp, mean)
        proj_cov = kl_full_cov_projection(cov, old_cov, self.cov_bound)
        return proj_mean, proj_cov


@dataclasses.dataclass(frozen=True)
class FullCovW2NonCommutingProjection:
    """WassersteinProjectionLayerNonCommuting equivalent (joint bound)."""

    mean_bound: float = 0.05
    cov_bound: float = 1e-3
    scale_prec: bool = False

    def __call__(self, mean, sqrt, old_mean, old_sqrt):
        return w2_non_commutative_projection(
            mean, sqrt, old_mean, old_sqrt, self.mean_bound + self.cov_bound, self.scale_prec
        )
