"""Trust-region projection layers (diagonal Gaussians), pure-JAX.

Re-design of
`geometry_rl/algorithms/trust_region_projections/projections/base_projection_layer.py`:
projection layers here are stateless dataclasses whose `__call__` is a pure
function `(p, q, step) -> projected p` — jit/grad/vmap-safe, no host state.
The entropy schedule's `initial_entropy` (mutable on the reference layer) is
passed explicitly through `step`-carrying state instead.

All layers operate on `DiagGaussian(mean, std)` batches.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..gaussian import (
    DiagGaussian,
    entropy,
    frobenius_parts,
    kl_parts,
    maha,
    wasserstein_parts,
)
from .kl import kl_diag_cov_projection


# ---------------------------------------------------------------------------
# Closed-form sub-projections (base_projection_layer.py:14-123)
# ---------------------------------------------------------------------------


def mean_projection(mean: jnp.ndarray, old_mean: jnp.ndarray, maha_part: jnp.ndarray, eps) -> jnp.ndarray:
    """Closed-form mean projection onto the Mahalanobis ball
    (base_projection_layer.py:71-100): interpolate toward old_mean with
    omega = sqrt(maha/eps) - 1 where maha > eps."""
    mask = maha_part > eps
    omega = jnp.sqrt(jnp.maximum(maha_part, 1e-16) / eps) - 1.0
    omega = jnp.abs(omega)[..., None]
    m = (mean + omega * old_mean) / (1.0 + omega + 1e-16)
    return jnp.where(mask[..., None], m, mean)


def entropy_inequality_projection(p: DiagGaussian, beta) -> DiagGaussian:
    """Scale std so entropy >= beta where violated
    (base_projection_layer.py:14-44, diagonal specialization)."""
    k = p.std.shape[-1]
    ent = entropy(p)
    mask = ent < beta
    alpha = jnp.exp((beta - ent) / k)
    new_std = p.std * alpha[..., None]
    return DiagGaussian(p.mean, jnp.where(mask[..., None], new_std, p.std))


def entropy_equality_projection(p: DiagGaussian, beta) -> DiagGaussian:
    """Scale std so entropy == beta exactly (base_projection_layer.py:47-68)."""
    k = p.std.shape[-1]
    alpha = jnp.exp((beta - entropy(p)) / k)
    return DiagGaussian(p.mean, p.std * alpha[..., None])


def entropy_schedule(schedule: Optional[str], total_train_steps: Optional[int], dim: Optional[int]):
    """Entropy-bound schedule factory (projection_utils.py:252-281).
    Returns f(initial_entropy, target_entropy, temperature, step)."""
    if schedule == "linear":
        return lambda e0, et, temp, step: step * (et - e0) / total_train_steps + e0
    if schedule == "exp":
        return lambda e0, et, temp, step: dim * et + (e0 - dim * et) * temp ** (10 * step / total_train_steps)
    return lambda e0, et, temp, step: jnp.asarray(-jnp.inf)


# ---------------------------------------------------------------------------
# Projection layers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BaseProjection:
    """No-op trust region (used for plain PPO — projection_factory.py:30-46).

    Subclasses override `_trust_region_projection`. The `__call__` template
    applies the optional entropy projection before/after, mirroring
    `BaseProjectionLayer._projection` (base_projection_layer.py:232-273).
    """

    mean_bound: float = 0.03
    cov_bound: float = 1e-3
    trust_region_coeff: float = 1.0
    scale_prec: bool = True
    entropy_schedule_type: Optional[str] = None
    action_dim: Optional[int] = None
    total_train_steps: Optional[int] = None
    target_entropy: float = 0.0
    temperature: float = 0.0
    entropy_eq: bool = False
    entropy_first: bool = False

    def __call__(
        self,
        p: DiagGaussian,
        q: DiagGaussian,
        step=0,
        initial_entropy: Optional[jnp.ndarray] = None,
    ) -> DiagGaussian:
        beta = self.entropy_bound(step, initial_entropy, p.mean.dtype)
        entropy_proj = entropy_equality_projection if self.entropy_eq else entropy_inequality_projection
        if self.entropy_first:
            p = entropy_proj(p, beta)
        proj = self._trust_region_projection(p, q, self.mean_bound, self.cov_bound)
        if self.entropy_first:
            return proj
        return entropy_proj(proj, beta)

    def _trust_region_projection(self, p: DiagGaussian, q: DiagGaussian, eps, eps_cov) -> DiagGaussian:
        return p

    # -- metrics & loss ------------------------------------------------------

    def trust_region_value(self, p: DiagGaussian, q: DiagGaussian) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return kl_parts(p, q)

    def trust_region_loss(self, p: DiagGaussian, proj_p: DiagGaussian) -> jnp.ndarray:
        """(mean_diff + cov_diff).mean() * coeff against the detached projection
        (base_projection_layer.py:292-327)."""
        target = DiagGaussian(jax.lax.stop_gradient(proj_p.mean), jax.lax.stop_gradient(proj_p.std))
        mean_diff, cov_diff = self.trust_region_value(p, target)
        return jnp.mean(mean_diff + cov_diff) * self.trust_region_coeff

    def entropy_bound(self, step, initial_entropy, dtype):
        if self.entropy_schedule_type is None:
            return jnp.asarray(-jnp.inf, dtype)
        sched = entropy_schedule(self.entropy_schedule_type, self.total_train_steps, self.action_dim)
        e0 = initial_entropy if initial_entropy is not None else jnp.asarray(0.0, dtype)
        return sched(e0, jnp.asarray(self.target_entropy, dtype), self.temperature, step)

    def compute_metrics(self, p: DiagGaussian, q: DiagGaussian) -> dict:
        """Constraint metrics dict (base_projection_layer.py:332-384)."""
        ent_old = entropy(q)
        ent = entropy(p)
        mean_kl, cov_kl = kl_parts(p, q)
        kl_val = mean_kl + cov_kl
        mean_diff, cov_diff = self.trust_region_value(p, q)
        combined = mean_diff + cov_diff
        entropy_diff = ent_old - ent
        return {
            "kl": kl_val.mean(),
            "constraint": combined.mean(),
            "mean_constraint": mean_diff.mean(),
            "cov_constraint": cov_diff.mean(),
            "entropy": ent.mean(),
            "entropy_diff": entropy_diff.mean(),
            "kl_max": kl_val.max(),
            "constraint_max": combined.max(),
            "mean_constraint_max": mean_diff.max(),
            "cov_constraint_max": cov_diff.max(),
            "entropy_max": ent.max(),
            "entropy_diff_max": entropy_diff.max(),
        }


@dataclasses.dataclass(frozen=True)
class KLProjection(BaseProjection):
    """KL projection: closed-form mean + on-device differentiable diag cov
    projection (replaces kl_projection_layer.py:14-111 + ITPAL)."""

    def _trust_region_projection(self, p: DiagGaussian, q: DiagGaussian, eps, eps_cov) -> DiagGaussian:
        mean_part, _ = kl_parts(p, q)
        proj_mean = mean_projection(p.mean, q.mean, mean_part, eps)
        proj_var = kl_diag_cov_projection(p.std**2, q.std**2, eps_cov)
        return DiagGaussian(proj_mean, jnp.sqrt(proj_var))


@dataclasses.dataclass(frozen=True)
class FrobeniusProjection(BaseProjection):
    """Frobenius projection (frob_projection_layer.py:9-88, diagonal):
    cov* = (cov + eta * cov_old) / (1 + eta) with
    eta = sqrt(cov_part / eps_cov) - 1 where cov_part > eps_cov."""

    def _trust_region_projection(self, p: DiagGaussian, q: DiagGaussian, eps, eps_cov) -> DiagGaussian:
        mean_part, cov_part = frobenius_parts(p, q, scale_prec=self.scale_prec)
        proj_mean = mean_projection(p.mean, q.mean, mean_part, eps)

        mask = cov_part > eps_cov
        eta = jnp.abs(jnp.sqrt(jnp.maximum(cov_part, 1e-16) / eps_cov) - 1.0)[..., None]
        var = p.std**2
        old_var = q.std**2
        proj_var = (var + eta * old_var) / (1.0 + eta + 1e-16)
        proj_std = jnp.where(mask[..., None], jnp.sqrt(proj_var), p.std)
        return DiagGaussian(proj_mean, proj_std)

    def trust_region_value(self, p, q):
        return frobenius_parts(p, q, scale_prec=self.scale_prec)


@dataclasses.dataclass(frozen=True)
class WassersteinProjection(BaseProjection):
    """Commutative W2 projection (w2_projection_layer.py:14-76, diagonal):
    sqrt* = (sqrt + eta * sqrt_old) / (1 + eta) on std (= sqrt of diag cov)."""

    def _trust_region_projection(self, p: DiagGaussian, q: DiagGaussian, eps, eps_cov) -> DiagGaussian:
        mean_part, cov_part = wasserstein_parts(p, q, scale_prec=self.scale_prec)
        proj_mean = mean_projection(p.mean, q.mean, mean_part, eps)

        mask = cov_part > eps_cov
        eta = jnp.abs(jnp.sqrt(jnp.maximum(cov_part, 1e-16) / eps_cov) - 1.0)[..., None]
        proj_std = (p.std + eta * q.std) / (1.0 + eta + 1e-16)
        proj_std = jnp.where(mask[..., None], proj_std, p.std)
        return DiagGaussian(proj_mean, proj_std)

    def trust_region_value(self, p, q):
        return wasserstein_parts(p, q, scale_prec=self.scale_prec)


def get_projection_layer(proj_type: str = "kl", **kwargs) -> BaseProjection:
    """Projection factory (projection_factory.py:9-48)."""
    proj_type = proj_type.lower()
    if proj_type == "kl":
        return KLProjection(**kwargs)
    if proj_type == "frob":
        return FrobeniusProjection(**kwargs)
    if proj_type in ("w2", "wasserstein", "w2_non_com"):
        # diagonal covariances always commute, so the non-commutative variant
        # (w2_projection_layer_non_com.py) coincides with the commutative one
        return WassersteinProjection(**kwargs)
    if proj_type == "papi":
        from .papi import PAPIProjection

        kwargs.setdefault("entropy_first", True)
        return PAPIProjection(**kwargs)
    if proj_type in ("", "ppo", "identity", "entropy", "none"):
        return BaseProjection(**kwargs)
    raise ValueError(f"Invalid projection type {proj_type!r}; use kl, frob, w2, papi or ppo.")
