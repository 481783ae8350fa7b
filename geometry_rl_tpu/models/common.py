"""Shared NN building blocks: MLPs, initializers, segment ops.

Replaces the reference's `utils/network_utils.py` (MLP builder + init) with
Flax equivalents, and torch_scatter with XLA segment ops batched over envs.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def orthogonal_init(gain: float = 1.0):
    return nn.initializers.orthogonal(scale=gain)


ACTIVATIONS = {
    "tanh": nn.tanh,
    "relu": nn.relu,
    "elu": nn.elu,
    "gelu": nn.gelu,
    "silu": nn.silu,
}


class MLP(nn.Module):
    """Plain MLP. `features` are the hidden+output sizes; activation between
    layers, optional LayerNorm after hidden layers (PyG MLP `norm` semantics:
    norm applies to hidden layers, not the output)."""

    features: Sequence[int]
    activation: Callable = nn.gelu
    layer_norm: bool = False
    final_activation: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=self.kernel_init, bias_init=self.bias_init)(x)
            is_last = i == n - 1
            if not is_last or self.final_activation:
                if self.layer_norm:
                    x = nn.LayerNorm()(x)
                x = self.activation(x)
        return x


def gather_nodes(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched node gather: x [B, N, ...], idx [B, E] int -> [B, E, ...]."""
    return jax.vmap(lambda xi, ii: jnp.take(xi, ii, axis=0))(x, idx)


def scatter_sum(messages: jnp.ndarray, dst: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """Batched scatter-add: messages [B, E, ...], dst [B, E] -> [B, N, ...].

    The torch_scatter.scatter(reduce='sum') equivalent (conv.py:141-148),
    vmapped over the env axis; XLA lowers this to a dense scatter-add which
    maps well onto TPU when E and N are static.
    """
    return jax.vmap(lambda m, d: jax.ops.segment_sum(m, d, num_segments=num_nodes))(messages, dst)


def scatter_mean(messages: jnp.ndarray, dst: jnp.ndarray, num_nodes: int, mask: Optional[jnp.ndarray] = None):
    if mask is not None:
        messages = messages * mask[(...,) + (None,) * (messages.ndim - mask.ndim)]
        weights = mask
    else:
        weights = jnp.ones(dst.shape, messages.dtype)
    total = scatter_sum(messages, dst, num_nodes)
    counts = scatter_sum(weights, dst, num_nodes)  # [B, N]
    counts = jnp.maximum(counts, 1.0).reshape(counts.shape + (1,) * (total.ndim - 2))
    return total / counts
