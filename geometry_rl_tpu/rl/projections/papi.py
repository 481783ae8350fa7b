"""PAPI projection (Akrour et al. 2019) — joint-bound expectation projection.

Redesign of `projections/papi_projection.py`: PAPI enforces ONE joint bound
eps = mean_bound + cov_bound on the EXPECTED KL over the batch (not
per-sample), by (1) interpolating the covariance toward the old one
(papi_projection.py:118-131) and (2) scaling the mean update by a factor
eta solving the remaining budget (papi_projection.py:137-153).

The reference additionally interpolates the policy's LAST-LAYER WEIGHTS
in torch (`papi_weight_update`, `_papi_steps` backtracking); the functional
equivalent here is `papi_weight_update(params, intermed_params, eta)` which
callers apply post-update — the distribution-level projection below is what
enters the loss. Diagonal-covariance specialization throughout (the only
registered policy family).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..gaussian import DiagGaussian, kl_parts
from .base import BaseProjection


@dataclasses.dataclass(frozen=True)
class PAPIProjection(BaseProjection):
    """entropy_first is implied (papi_projection.py:38 asserts it)."""

    def _trust_region_projection(self, p: DiagGaussian, q: DiagGaussian, eps, eps_cov) -> DiagGaussian:
        eps_joint = eps + eps_cov  # joint bound (papi_projection.py:100)

        maha_part, cov_part = kl_parts(p, q)
        maha_mean = maha_part.mean()
        cov_mean = cov_part.mean()
        exceeded = maha_mean + cov_mean > eps_joint + 1e-6

        # --- covariance rotation/rescaling (expectation-level) -------------
        var, old_var = p.std**2, q.std**2
        eta_rot = eps_joint / jnp.maximum(maha_mean + cov_mean, 1e-16)
        new_var = jnp.where(exceeded, (1.0 - eta_rot) * old_var + eta_rot * var, var)
        # recompute the cov part of the expected KL for the projected cov
        k = var.shape[-1]
        trace_term = 0.5 * (jnp.sum(new_var / old_var, axis=-1) - k).mean()
        entropy_diff = 0.5 * (jnp.sum(jnp.log(old_var), -1) - jnp.sum(jnp.log(new_var), -1)).mean()
        cov_new = jnp.where(exceeded, trace_term + entropy_diff, cov_mean)

        # --- mean interpolation ---------------------------------------------
        still_exceeded = maha_mean + cov_new > eps_joint + 1e-6
        eta_mean = jnp.sqrt(
            jnp.maximum(eps_joint - cov_new, 1e-16) / jnp.maximum(maha_mean, 1e-16)
        )
        eta_mean = jnp.where(still_exceeded, jnp.minimum(eta_mean, 1.0), 1.0)
        proj_mean = q.mean + eta_mean * (p.mean - q.mean)
        return DiagGaussian(proj_mean, jnp.sqrt(new_var))


def papi_weight_update(params, intermed_params, eta: jnp.ndarray):
    """Functional `papi_weight_update`: interpolate every parameter toward the
    intermediate (pre-update) parameters by eta — the last-layer-only variant
    is obtained by passing trees containing just those leaves."""
    return jax.tree_util.tree_map(lambda new, old: old + eta * (new - old), params, intermed_params)
