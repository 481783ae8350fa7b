"""Differentiable diagonal KL covariance projection — fully on-device.

Replaces the external C++/NLopt `cpp_projection.BatchedDiagCovOnlyProjection`
(ITPAL) used by the reference at
`geometry_rl/algorithms/trust_region_projections/projections/kl_projection_layer.py:162-204`,
where dist params were moved GPU→CPU→numpy per minibatch (`objectives/trpl.py:241-245`).

Problem (per batch element, diagonal covariance, variances v, v_old > 0):

    min_{v*}  KLcov(v* || v)   s.t.  KLcov(v* || v_old) <= eps

with KLcov(a || b) = 0.5 * sum_i [ a_i/b_i - 1 + log b_i - log a_i ].

KKT stationarity gives the precision interpolation (Otto et al. 2021, TRPL):

    1/v*_i = (1/v_i + eta / v_old_i) / (1 + eta),    eta >= 0

and eta solves KLcov(v*(eta) || v_old) = eps when the constraint is active
(KLcov is monotonically decreasing in eta, -> 0 as eta -> inf). We solve the
scalar dual with a fixed-iteration bisection in log-space — vectorized over the
batch, pure XLA, no host callback — and differentiate the solution with the
implicit function theorem via `jax.custom_vjp`.

Gradient semantics match ITPAL's autograd.Function: gradients flow to the NEW
variance only (backward returns None for old_cov and eps —
`kl_projection_layer.py:195-204`).

Failure fallback: if the solve produces non-finite values, the projected
variance falls back to v_old (reference `kl_projection_layer.py:73-74`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BISECT_ITERS = 60  # 2^-60 relative bracket width — beyond f32 resolution
_ETA_MAX = 1e12


def _kl_cov_diag(var_p: jnp.ndarray, var_q: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum(v_p/v_q - 1 + log v_q - log v_p) over the last axis."""
    ratio = var_p / var_q
    return 0.5 * jnp.sum(ratio - 1.0 - jnp.log(ratio), axis=-1)


def _interp_var(var: jnp.ndarray, old_var: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """v*(eta): precision-space interpolation between var (eta=0) and old_var."""
    eta = eta[..., None]
    return (1.0 + eta) / (1.0 / var + eta / old_var)


def _solve_eta(var: jnp.ndarray, old_var: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """Bisection for the scalar dual eta per batch element (no gradients).

    Solves KLcov(v*(eta) || v_old) = eps on eta in [0, ETA_MAX]. The constraint
    value at eta=0 is KLcov(v || v_old); if already <= eps, returns eta = 0.
    """

    def constraint(eta):
        return _kl_cov_diag(_interp_var(var, old_var, eta), old_var) - eps

    needs_proj = constraint(jnp.zeros(var.shape[:-1], var.dtype)) > 0.0

    lo = jnp.zeros(var.shape[:-1], var.dtype)
    hi = jnp.full(var.shape[:-1], _ETA_MAX, var.dtype)

    def body(_, carry):
        lo, hi = carry
        # geometric-ish midpoint: arithmetic in log1p space is far better
        # conditioned for a bracket spanning [0, 1e12]
        mid = jnp.expm1(0.5 * (jnp.log1p(lo) + jnp.log1p(hi)))
        gt = constraint(mid) > 0.0  # still violating -> need larger eta
        lo = jnp.where(gt, mid, lo)
        hi = jnp.where(gt, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    eta = 0.5 * (lo + hi)
    return jnp.where(needs_proj, eta, 0.0)


def kl_diag_cov_projection(var: jnp.ndarray, old_var: jnp.ndarray, eps) -> jnp.ndarray:
    """Project new variances `var` into the KL ball of radius `eps` around
    `old_var`. Shapes: var, old_var [..., K]; eps scalar or [...]. Returns
    projected variances [..., K]. Differentiable w.r.t. `var` only."""
    eps = jnp.broadcast_to(jnp.asarray(eps, var.dtype), var.shape[:-1])
    return _kl_diag_cov_projection(var, old_var, eps)


@partial(jax.custom_vjp, nondiff_argnums=())
def _kl_diag_cov_projection(var: jnp.ndarray, old_var: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    proj, _ = _forward(var, old_var, eps)
    return proj


def _forward(var, old_var, eps):
    eta = _solve_eta(var, old_var, eps)
    proj = _interp_var(var, old_var, eta)
    # fallback: keep old variance where the solve went non-finite
    bad = ~jnp.all(jnp.isfinite(proj), axis=-1, keepdims=True)
    proj = jnp.where(bad, old_var, proj)
    return proj, (var, old_var, eps, eta, bad)


def _fwd(var, old_var, eps):
    proj, res = _forward(var, old_var, eps)
    return proj, res


def _bwd(res, g):
    var, old_var, eps, eta, bad = res
    active = eta > 0.0

    # closed-form pieces at the solution (all elementwise over K):
    #   f(v, eta)   = (1+eta) / (1/v + eta/v_old)          (projected variance)
    #   c(v, eta)   = KLcov(f(v, eta) || v_old) - eps      (dual constraint)
    # total derivative: dproj/dv = f_v + f_eta * deta/dv,
    #                   deta/dv = -c_v / c_eta            (implicit fn thm)
    denom = 1.0 / var + eta[..., None] / old_var  # = (1+eta)/proj
    proj = (1.0 + eta[..., None]) / denom

    # f_v: d proj_i / d v_i = (1+eta) * v^-2 / denom^2
    f_v = (1.0 + eta[..., None]) / (denom * var) ** 2
    # f_eta: d proj_i / d eta = [denom - (1+eta)/v_old] / denom^2
    #      = (1/v - 1/v_old) / denom^2
    f_eta = (1.0 / var - 1.0 / old_var) / denom**2

    # c depends on v only through proj: dc/dproj_i = 0.5 * (1/v_old_i - 1/proj_i)
    c_proj = 0.5 * (1.0 / old_var - 1.0 / proj)
    c_v = c_proj * f_v
    c_eta = jnp.sum(c_proj * f_eta, axis=-1)

    g_f_eta = jnp.sum(g * f_eta, axis=-1)
    # guard divide for inactive samples (c_eta != 0 whenever active)
    safe_c_eta = jnp.where(active, c_eta, 1.0)
    correction = c_v * (g_f_eta / safe_c_eta)[..., None]

    d_var_active = g * f_v - correction
    d_var = jnp.where(active[..., None], d_var_active, g)  # inactive: identity
    d_var = jnp.where(bad, jnp.zeros_like(d_var), d_var)  # fallback: no grad
    return d_var, jnp.zeros_like(old_var), jnp.zeros_like(eps)


_kl_diag_cov_projection.defvjp(_fwd, _bwd)
