"""Diagonal-Gaussian graph policy heads (Flax).

TPU redesign of
`geometry_rl/algorithms/trust_region_projections/models/policy/
{abstract_gnn_gaussian_policy,gnn_gaussian_policy_diag}.py`:

- `post_fc=False` (HEPi / EMPN): the backbone's equivariant vector output IS
  the action mean (gnn_gaussian_policy_diag.py:66-68); std head reads the
  invariant latent.
- `post_fc=True` (Transformer / GCN): mean = Dense(latent)
  (gnn_gaussian_policy_diag.py:79-83).
- `per_actuator_heads` (two-agent tasks, action_dim list): separate mean/std
  heads per actuator (abstract_gnn_gaussian_policy.py:57-74).
- std = softplus(pre_std + shift) + minimal_std with
  shift = softplus^-1(init_std - minimal_std)
  (abstract_gaussian_policy `_get_preactivation_shift` semantics).

Returns a `DiagGaussian(mean [B, A], std [B, A])`.
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from ..graphs.types import GraphFeatures, HeteroGraph
from ..rl.gaussian import DiagGaussian


def inverse_softplus(x: float) -> float:
    """softplus^-1 for the std pre-activation shift (torch_utils.py:361)."""
    return math.log(math.expm1(x)) if x < 20.0 else x


class DiagGaussianPolicy(nn.Module):
    backbone: nn.Module
    action_dim: int  # TOTAL action dimension
    num_actuators: int = 1
    share_action_dim: bool = True
    per_actuator_heads: bool = False
    contextual_std: bool = True
    post_fc: bool = True
    init_std: float = 1.0
    minimal_std: float = 1e-5
    use_tanh_mean: bool = False
    head_init: Callable = nn.initializers.orthogonal(scale=0.01)

    @nn.compact
    def __call__(self, graph: HeteroGraph, feats: GraphFeatures, **backbone_kwargs) -> DiagGaussian:
        out = self.backbone(graph, feats, **backbone_kwargs)
        out, hidden = out  # (vector_out, latent) — all backbones return both
        B = hidden.shape[0]
        G = hidden.shape[1]
        shift = inverse_softplus(self.init_std - self.minimal_std)

        def std_from_pre(pre):
            return nn.softplus(pre + shift) + self.minimal_std

        if self.per_actuator_heads:
            a_dim = self.action_dim // self.num_actuators
            means, stds = [], []
            for i in range(self.num_actuators):
                h_i = hidden[:, i]
                m = nn.Dense(a_dim, kernel_init=self.head_init, name=f"mean_{i}")(h_i)
                if self.contextual_std:
                    pre = nn.Dense(a_dim, kernel_init=self.head_init, name=f"pre_std_{i}")(h_i)
                else:
                    pre = self.param(f"pre_std_{i}", nn.initializers.normal(0.01), (a_dim,))
                    pre = jnp.broadcast_to(pre, (B, a_dim))
                means.append(m)
                stds.append(std_from_pre(pre))
            mean = jnp.concatenate(means, axis=-1)
            std = jnp.concatenate(stds, axis=-1)
        else:
            a_dim = self.action_dim // self.num_actuators if self.share_action_dim else self.action_dim
            if self.post_fc:
                mean = nn.Dense(a_dim, kernel_init=self.head_init, name="mean")(hidden)  # [B,G,a]
            else:
                mean = out.reshape(B, G, -1)  # equivariant vector output is the mean
            if self.contextual_std:
                pre = nn.Dense(a_dim, kernel_init=self.head_init, name="pre_std")(hidden)  # [B,G,a]
            else:
                pre = self.param("pre_std", nn.initializers.normal(0.01), (a_dim,))
                pre = jnp.broadcast_to(pre, (B, G, a_dim))
            mean = mean.reshape(B, -1)
            std = std_from_pre(pre).reshape(B, -1)

        if self.use_tanh_mean:
            mean = jnp.tanh(mean)
        return DiagGaussian(mean, std)
