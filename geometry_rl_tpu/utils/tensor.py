"""Tensor utilities — the `utils/torch_utils.py` parity surface.

JAX equivalents of the reference helpers that remain meaningful here
(algorithms/trust_region_projections/utils/torch_utils.py): batched traces,
matrix square roots (Newton/Denman-Beavers and eigen), triangular
packing/unpacking for full-covariance policies, inverse softplus, one-/two-hot
encodings, and minibatch index generation. Several reference helpers are
obsolete by construction (`tensorize`/`get_numpy` device shuffling — JAX
arrays are device-resident; `flatten_batch` — jnp.reshape).
"""

from __future__ import annotations

import math
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


def batched_trace(x: jnp.ndarray) -> jnp.ndarray:
    """tr(X) over the last two dims (torch_batched_trace)."""
    return jnp.trace(x, axis1=-2, axis2=-1)


def batched_trace_square(x: jnp.ndarray) -> jnp.ndarray:
    """tr(X X^T) = sum of squares (torch_batched_trace_square)."""
    return jnp.sum(x * x, axis=(-2, -1))


def sqrtm_newton(mat: jnp.ndarray, num_iters: int = 20) -> jnp.ndarray:
    """Matrix square root via the Denman-Beavers iteration (sqrtm_newton) —
    batched, differentiable, PSD inputs."""
    dim = mat.shape[-1]
    norm = jnp.linalg.norm(mat, axis=(-2, -1), keepdims=True)
    y = mat / norm
    eye = jnp.broadcast_to(jnp.eye(dim, dtype=mat.dtype), mat.shape)
    z = eye

    def body(_, carry):
        y, z = carry
        t = 0.5 * (3.0 * eye - z @ y)
        return y @ t, t @ z

    y, z = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return y * jnp.sqrt(norm)


def sqrtm_eig(mat: jnp.ndarray) -> jnp.ndarray:
    """Matrix square root via eigendecomposition (sqrtm) — symmetric PSD."""
    w, v = jnp.linalg.eigh(mat)
    w = jnp.sqrt(jnp.maximum(w, 0.0))
    return (v * w[..., None, :]) @ jnp.swapaxes(v, -2, -1)


def fill_triangular(x: jnp.ndarray, upper: bool = False) -> jnp.ndarray:
    """Pack a [..., d(d+1)/2] vector into a lower (default) triangular matrix
    (torch_utils.fill_triangular semantics)."""
    m = x.shape[-1]
    d = int((math.sqrt(8 * m + 1) - 1) / 2)
    idx = np.tril_indices(d)
    out = jnp.zeros(x.shape[:-1] + (d, d), x.dtype)
    out = out.at[..., idx[0], idx[1]].set(x)
    return jnp.swapaxes(out, -2, -1) if upper else out


def fill_triangular_inverse(mat: jnp.ndarray, upper: bool = False) -> jnp.ndarray:
    """Unpack a triangular matrix back to its packed vector."""
    d = mat.shape[-1]
    if upper:
        mat = jnp.swapaxes(mat, -2, -1)
    idx = np.tril_indices(d)
    return mat[..., idx[0], idx[1]]


def inverse_softplus(x):
    """softplus^-1 (torch_utils.py:361), numerically safe for large x."""
    x = jnp.asarray(x)
    return jnp.where(x < 20.0, jnp.log(jnp.expm1(jnp.minimum(x, 20.0))), x)


def polyak_update(target_params, online_params, tau: float):
    """target <- (1 - tau) * target + tau * online (network_utils.polyak_update)."""
    return jax.tree_util.tree_map(lambda t, o: (1.0 - tau) * t + tau * o, target_params, online_params)


def one_hot(idx: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(idx, num_classes)


def two_hot(x: jnp.ndarray, bins: jnp.ndarray) -> jnp.ndarray:
    """Two-hot encoding of scalars onto a bin grid (torch_utils two-hot):
    mass split linearly between the two neighboring bins."""
    x = jnp.clip(x, bins[0], bins[-1])
    upper_idx = jnp.clip(jnp.searchsorted(bins, x, side="left"), 1, len(bins) - 1)
    lower_idx = upper_idx - 1
    lower, upper = bins[lower_idx], bins[upper_idx]
    w_upper = (x - lower) / jnp.maximum(upper - lower, 1e-8)
    out = jnp.zeros(x.shape + (len(bins),))
    out = out.at[..., lower_idx].add(1.0 - w_upper)
    out = out.at[..., upper_idx].add(w_upper)
    return out


def generate_minibatches(key: jax.Array, n: int, batch_size: int) -> Iterator[jnp.ndarray]:
    """Shuffled minibatch index arrays (torch_utils.generate_minibatches);
    host-side generator for non-jitted loops (the jitted trainer uses
    jax.random.permutation inline)."""
    perm = jax.random.permutation(key, n)
    for start in range(0, n - batch_size + 1, batch_size):
        yield perm[start : start + batch_size]
