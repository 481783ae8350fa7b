"""Fused-inference HEPi forward: raw-params reimplementation of HEPi.__call__
routing every FiberBundleConv through the Pallas kernel (ops/pallas_hepi.py).

Used for COLLECTION and EVAL only (no gradients): the rollout scan samples
actions from the policy at every control step, and the conv's [B, E, O, C]
HBM intermediates dominate that forward on TPU. The training update keeps the
Flax/XLA path (autodiff), so the kernel needs no custom VJP.

Parity: tests/test_pallas_hepi.py gates this function against
`DiagGaussianPolicy(HEPi).apply` on the real task graphs.

Reference mapping: hepi.py:125-190 (forward), conv.py:64-157 (the fused op),
gnn_gaussian_policy_diag.py:64-87 (the diag-Gaussian head reproduced here).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..graphs.types import GraphFeatures, HeteroGraph
from ..ops.pallas_hepi import hepi_conv_fused, weights_from_flax
from ..rl.gaussian import DiagGaussian
from ..utils.math import fibonacci_lattice
from .common import gather_nodes
from .policy import inverse_softplus
from .ponita import compute_invariants, polynomial_features, scalar_to_sphere, vec_to_sphere


def _mlp2(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """PolynomialBasis tail: Dense -> gelu -> Dense -> gelu (raw params),
    computed in the input's dtype (bf16 in the prologue, like Flax dtype=)."""
    dt = x.dtype
    x = jax.nn.gelu(x @ params["Dense_0"]["kernel"].astype(dt) + params["Dense_0"]["bias"].astype(dt))
    return jax.nn.gelu(x @ params["Dense_1"]["kernel"].astype(dt) + params["Dense_1"]["bias"].astype(dt))


def hepi_apply_fused(
    hepi_params: Dict,
    graph: HeteroGraph,
    feats: GraphFeatures,
    *,
    num_ori: int,
    only_upper_hemisphere: bool = True,
    degree: int = 2,
    num_messages: int = 2,
    edge_levels=("internal", "agent", "task"),
    message_codes=((1, 0), (0, 1), (0, 1)),
    output_dim: int = 1,
    tile_envs: int = 16,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """HEPi forward with fused convs. Returns (out [B,G,V,3], latent [B,G,C])."""
    ori_grid = fibonacci_lattice(num_ori, upper_hemisphere=only_upper_hemisphere)

    # node encoder (shared Dense, no bias)
    w_enc = hepi_params["node_encoder"]["kernel"]
    latent: Dict[str, jnp.ndarray] = {}
    for nt in graph.node_types:
        scalar = scalar_to_sphere(feats.scalars[nt], ori_grid)
        vector = vec_to_sphere(feats.vectors[nt], ori_grid)
        x = jnp.concatenate([scalar, vector], axis=-1)
        latent[nt] = x @ w_enc

    # fiber kernel basis (edge independent): ori_inv [O, O, 1] -> [O, O, A]
    ori_inv = jnp.sum(ori_grid[None, :, :] * ori_grid[:, None, :], axis=-1, keepdims=True)
    fiber_basis = _mlp2(hepi_params["fiber_basis_fn"], polynomial_features(ori_inv, degree))

    # XLA PROLOGUE (dense, MXU-friendly — pallas_hepi.py v2 docstring):
    # pairwise invariants + polynomial basis MLP per edge type, computed once
    # and shared by both message rounds like the Flax path (hepi.py:145-157)
    bf16 = compute_dtype
    kernel_basis: Dict = {}
    for ek, es in graph.edges.items():
        s, _, d = ek
        pos_src = gather_nodes(graph.nodes[s].pos, es.src)
        pos_dst = gather_nodes(graph.nodes[d].pos, es.dst)
        spatial_inv, _ = compute_invariants(ori_grid, pos_src, pos_dst)
        kernel_basis[ek] = _mlp2(
            hepi_params["basis_fn"], polynomial_features(spatial_inv, degree).astype(bf16)
        )  # [B, E, O, A]

    for k in range(num_messages):
        out_dst: Dict[str, list] = {}
        for ek, es in graph.edges.items():
            s, level, d = ek
            li = edge_levels.index(level) if level in edge_levels else -1
            if li < 0 or message_codes[li][k] != 1:
                continue
            conv_scope = f"processor_{k}_{level}"
            w = weights_from_flax(hepi_params, fiber_basis, conv_scope)
            # spatial kernel = Dense(basis), still in the XLA prologue
            wk = hepi_params[conv_scope]["kernel"]["kernel"].astype(bf16)
            kern = kernel_basis[ek] @ wk  # [B, E, O, C]
            updated = hepi_conv_fused(
                latent[s],
                latent[d],
                kern,
                es.src.astype(jnp.int32),
                es.dst.astype(jnp.int32),
                es.mask.astype(jnp.float32) if es.mask is not None else jnp.ones(es.src.shape, jnp.float32),
                w,
                tile_envs=tile_envs,
                compute_dtype=compute_dtype,
                interpret=interpret,
            )
            out_dst.setdefault(d, []).append(updated)
        for d, vals in out_dst.items():
            latent[d] = sum(vals) if len(vals) > 1 else vals[0]

    h = latent[graph.output_node_type]  # [B, G, O, C]
    dec = hepi_params["decoder"]
    output = (h @ dec["kernel"] + dec["bias"]).astype(jnp.float32)
    out_scalar = output[..., :output_dim].mean(axis=-2)
    out_vec_sph = output[..., output_dim:]
    out_vec = jnp.einsum("bgov,od->bgvd", out_vec_sph, ori_grid) / num_ori
    out = out_vec * out_scalar[..., None]
    latent_mean = h.astype(jnp.float32).mean(axis=-2)
    return out, latent_mean


def hepi_policy_dist_fused(policy, params, graph, feats, *, tile_envs: int = 16, compute_dtype=jnp.bfloat16, interpret: bool = False) -> DiagGaussian:
    """DiagGaussianPolicy(HEPi backbone, post_fc=False, contextual_std,
    share_action_dim) forward with the fused backbone. `policy` is the Flax
    module (for config attributes), `params` its full param tree."""
    hepi = policy.backbone
    p = params["params"]
    out, hidden = hepi_apply_fused(
        p["backbone"],
        graph,
        feats,
        num_ori=hepi.num_ori,
        only_upper_hemisphere=hepi.only_upper_hemisphere,
        degree=hepi.degree,
        num_messages=hepi.num_messages,
        edge_levels=tuple(hepi.edge_levels),
        message_codes=tuple(tuple(c) for c in hepi.message_codes),
        output_dim=hepi.output_dim,
        tile_envs=tile_envs,
        compute_dtype=compute_dtype,
        interpret=interpret,
    )
    B, G = hidden.shape[:2]
    mean = out.reshape(B, G, -1)
    pre = hidden @ p["pre_std"]["kernel"] + p["pre_std"]["bias"]
    shift = inverse_softplus(policy.init_std - policy.minimal_std)
    std = jax.nn.softplus(pre + shift) + policy.minimal_std
    return DiagGaussian(mean.reshape(B, -1), std.reshape(B, -1))


def fused_hepi_supported(policy) -> bool:
    """The fused path covers the configuration every HEPi task config uses:
    post_fc=False equivariant mean, contextual std, shared action head."""
    from .hepi import HEPi

    return (
        isinstance(getattr(policy, "backbone", None), HEPi)
        and not policy.post_fc
        and policy.contextual_std
        and not policy.per_actuator_heads
        and not getattr(policy.backbone, "concat_global", False)
    )
