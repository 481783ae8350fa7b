"""Fused HEPi FiberBundleConv forward as a Pallas TPU kernel.

The XLA path (models/ponita.FiberBundleConv) materializes the [B, E, O, C]
edge tensors (kernel basis, spatial kernel, gathered neighbours, messages) in
HBM between fusions — ~1.5 GB of read+write traffic per message round at
1024 envs, which is ~85% of the HEPi forward time on v5e. This kernel runs
one whole conv (basis MLP -> spatial kernel -> gather -> message -> scatter
-> fiber conv -> ConvNeXt update) for a TILE of envs entirely in VMEM:
HBM traffic collapses to the node latents plus 3 floats per edge.

Key layout decisions (see /opt/skills/guides/pallas_guide.md):
  - grid = (B / TB,): each program owns TB envs; all big matmuls batch the
    tile's envs together so the MXU never sees a per-env minibatch.
  - gather/scatter are BLOCK-DIAGONAL one-hot matmuls: rows of the
    [TB*E, TB*Ns] one-hot select env-offset node columns, turning TB
    per-env gathers into ONE [TB*E, TB*Ns] x [TB*Ns, O*C] contraction
    (K = TB*Ns >= 128 keeps the MXU full; the per-env variant at K = Ns = 33
    is what made the first-generation cloth kernel 28x slower than XLA).
  - pairwise invariants are recomputed in-kernel from rel_pos [E, 3] and the
    static ori_grid — 16x less input traffic than shipping [E, O, 2].
  - the orientation (fiber) conv is a VPU loop over O with P*C = O*C lanes
    per iteration (dense [rows, O*C] FMA), avoiding a lane-starved batched
    matmul over the 16-wide orientation axis.

Numerics mirror FiberBundleConv (depthwise, use_bias=True) bit-approximately
in f32; parity is gated by tests/test_pallas_hepi.py against the Flax module.
Used for the COLLECTION forward only (policy sampling inside the rollout
scan); the update path keeps the XLA implementation, so no custom VJP is
needed.

Reference: geometry_rl/modules/pyg_models/ponita/conv.py:64-157 (the op being
fused), hepi.py:109-123 (invariants).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class HEPiConvWeights(NamedTuple):
    """Per-conv parameters, all f32, laid out for the kernel.

    Shapes: basis MLP (PolynomialBasis: poly feats deg 2 of [.,2] -> 14 dims)
    w1 [14, H], b1 [H], w2 [H, A], b2 [A]; spatial kernel wk [A, C] (no
    bias); fiber kernel fk [O, O, C] (PRE-APPLIED Dense of the fiber basis,
    computed once in XLA — it is tiny and edge-independent); conv bias [C];
    LayerNorm ln_scale/ln_bias [C]; ConvNeXt MLP wm1 [C, WF*C], bm1, wm2
    [WF*C, C], bm2.
    """

    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray
    wk: jnp.ndarray
    fk: jnp.ndarray
    bias: jnp.ndarray
    ln_scale: jnp.ndarray
    ln_bias: jnp.ndarray
    wm1: jnp.ndarray
    bm1: jnp.ndarray
    wm2: jnp.ndarray
    bm2: jnp.ndarray


def _poly2_ref(x):
    """Reference ordering (ponita.polynomial_features): cubic terms are
    outer(quad, x) flattened as [q0a, q0b, q1a, q1b, ...]. Built from
    column slices + concat (Mosaic cannot reshape the minor dims here)."""
    a = x[..., 0:1]
    b = x[..., 1:2]
    quad = jnp.concatenate([a * a, a * b, b * a, b * b], axis=-1)
    qa = quad * a
    qb = quad * b
    cub = jnp.concatenate(
        [v[..., i : i + 1] for i in range(4) for v in (qa, qb)], axis=-1
    )
    return jnp.concatenate([x, quad, cub], axis=-1)


def _block_one_hot(idx_ref_row, n_per_env, tb, dtype):
    """[TB, E] indices -> [TB*E, TB*n] block-diagonal one-hot (iota compare);
    row (t, e) has a 1 at column t*n + idx[t, e]."""
    e = idx_ref_row.shape[1]
    env_of_row = jax.lax.broadcasted_iota(jnp.int32, (tb, e), 0)
    target = env_of_row * n_per_env + idx_ref_row  # [TB, E]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tb, e, tb * n_per_env), 2)
    oh = (cols == target[:, :, None]).astype(dtype)  # [TB, E, TB*n]
    return oh.reshape(tb * e, tb * n_per_env)  # major merge, lanes unchanged


def _conv_kernel(
    # refs (blocked on env axis): see hepi_conv_fused for shapes
    x_src_ref,
    x_dst_ref,
    rel_ref,
    src_ref,
    dst_ref,
    mask_ref,
    ori_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    wk_ref,
    fk_ref,
    bias_ref,
    lns_ref,
    lnb_ref,
    wm1_ref,
    bm1_ref,
    wm2_ref,
    bm2_ref,
    out_ref,
    *,
    tb: int,
    ns: int,
    nd: int,
    e: int,
    o: int,
    c: int,
):
    f32 = jnp.float32

    # Mosaic layout rule driving this kernel: the LANE (last) dim never
    # changes size across a reshape — everything lives in [rows, C] (or
    # [rows, small]) form, per-orientation work is static slices and
    # row-major concats. No [*, O*C] tensors.
    src_idx = src_ref[...].reshape(tb, e)
    dst_idx = dst_ref[...].reshape(tb, e)

    # ---- pairwise invariants from rel_pos (hepi.py:109-123) ---------------
    rel = rel_ref[...].astype(f32).reshape(tb * e, 3)  # [TBE, 3]
    ori = ori_ref[...].astype(f32)  # [O, 3]
    inv1 = jax.lax.dot_general(rel, ori.T, (((1,), (0,)), ((), ())))  # [TBE, O]
    # orth component norm: |rel|^2 - inv1^2 (rel - inv1*ori is orthogonal)
    rel_sq = jnp.sum(rel * rel, axis=-1, keepdims=True)  # [TBE, 1]
    inv2 = jnp.sqrt(jnp.maximum(rel_sq - inv1 * inv1, 0.0))  # [TBE, O]

    # ---- basis MLP + spatial kernel, o-major rows [(o, e), .] -------------
    # si rows ordered o-major so per-o row blocks are contiguous slices
    si = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    jax.lax.slice_in_dim(inv1, oo, oo + 1, axis=1),
                    jax.lax.slice_in_dim(inv2, oo, oo + 1, axis=1),
                ],
                axis=-1,
            )
            for oo in range(o)
        ],
        axis=0,
    )  # [O*TBE, 2]
    feats = _poly2_ref(si)  # [O*TBE, 14]
    h = jax.nn.gelu(
        jax.lax.dot_general(feats, w1_ref[...], (((1,), (0,)), ((), ()))) + b1_ref[...]
    )
    basis = jax.nn.gelu(
        jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ()))) + b2_ref[...]
    )
    kern = jax.lax.dot_general(basis, wk_ref[...], (((1,), (0,)), ((), ())))  # [O*TBE, C]

    # ---- per-orientation gather -> message -> scatter ---------------------
    oh_src = _block_one_hot(src_idx, ns, tb, f32)  # [TBE, TB*Ns]
    oh_dst = _block_one_hot(dst_idx, nd, tb, f32)  # [TBE, TB*Nd]
    mask_rows = mask_ref[...].astype(f32).reshape(tb * e, 1)
    x_src = x_src_ref[...].astype(f32)  # [TB, Ns, O, C]

    x1_blocks = []  # per-o [TB*Nd, C]
    for oo in range(o):
        xs_o = jax.lax.slice_in_dim(x_src, oo, oo + 1, axis=2).reshape(tb * ns, c)
        x_j = jax.lax.dot_general(oh_src, xs_o, (((1,), (0,)), ((), ())))  # [TBE, C]
        kern_o = jax.lax.slice_in_dim(kern, oo * tb * e, (oo + 1) * tb * e, axis=0)
        msg = kern_o * x_j * mask_rows
        x1_blocks.append(jax.lax.dot_general(oh_dst, msg, (((0,), (0,)), ((), ()))))

    # ---- fiber (orientation) conv + ConvNeXt, per output orientation p ----
    fk = fk_ref[...].astype(f32)  # [O, P, C]
    x_dst = x_dst_ref[...].astype(f32)  # [TB, Nd, O, C]
    bias = bias_ref[...]
    lns = lns_ref[...]
    lnb = lnb_ref[...]
    for p in range(o):
        x2_p = jnp.zeros((tb * nd, c), f32)
        for oo in range(o):
            fk_op = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(fk, oo, oo + 1, axis=0), p, p + 1, axis=1
            ).reshape(1, c)
            x2_p = x2_p + x1_blocks[oo] * fk_op
        x2_p = x2_p / float(o) + bias  # [TB*Nd, C]

        mu = jnp.mean(x2_p, axis=-1, keepdims=True)
        var = jnp.mean((x2_p - mu) ** 2, axis=-1, keepdims=True)
        hn = (x2_p - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
        hm = jax.nn.gelu(
            jax.lax.dot_general(hn, wm1_ref[...], (((1,), (0,)), ((), ()))) + bm1_ref[...]
        )
        hm = jax.lax.dot_general(hm, wm2_ref[...], (((1,), (0,)), ((), ()))) + bm2_ref[...]

        xd_p = jax.lax.slice_in_dim(x_dst, p, p + 1, axis=2).reshape(tb * nd, c)
        out_ref[:, :, p : p + 1, :] = (xd_p + hm).reshape(tb, nd, 1, c).astype(out_ref.dtype)


def hepi_conv_fused(
    x_src: jnp.ndarray,  # [B, Ns, O, C]
    x_dst: jnp.ndarray,  # [B, Nd, O, C]
    rel_pos: jnp.ndarray,  # [B, E, 3] pos_src - pos_dst per edge
    src: jnp.ndarray,  # [B, E] int32
    dst: jnp.ndarray,  # [B, E] int32
    edge_mask: jnp.ndarray,  # [B, E]
    ori_grid: jnp.ndarray,  # [O, 3]
    w: HEPiConvWeights,
    *,
    tile_envs: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused depthwise FiberBundleConv forward. Returns updated x_dst."""
    B, Ns, O, C = x_src.shape
    Nd = x_dst.shape[1]
    E = src.shape[1]
    tb = min(tile_envs, B)
    if B % tb:  # pad env axis to a tile multiple
        pad = tb - B % tb
        x_src = jnp.concatenate([x_src, x_src[:pad]], 0)
        x_dst = jnp.concatenate([x_dst, x_dst[:pad]], 0)
        rel_pos = jnp.concatenate([rel_pos, rel_pos[:pad]], 0)
        src = jnp.concatenate([src, src[:pad]], 0)
        dst = jnp.concatenate([dst, dst[:pad]], 0)
        edge_mask = jnp.concatenate([edge_mask, edge_mask[:pad]], 0)
    Bp = x_src.shape[0]

    kernel = partial(_conv_kernel, tb=tb, ns=Ns, nd=Nd, e=E, o=O, c=C)

    def env_block(shape):
        return pl.BlockSpec((tb,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM)

    def shared(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    weights = [w.w1, w.b1, w.w2, w.b2, w.wk, w.fk, w.bias, w.ln_scale, w.ln_bias, w.wm1, w.bm1, w.wm2, w.bm2]
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tb,),
        in_specs=[
            env_block((Ns, O, C)),
            env_block((Nd, O, C)),
            env_block((E, 3)),
            env_block((E, 1)),
            env_block((E, 1)),
            env_block((E, 1)),
            shared(ori_grid),
            *[shared(x) for x in weights],
        ],
        out_specs=env_block((Nd, O, C)),
        out_shape=jax.ShapeDtypeStruct((Bp, Nd, O, C), x_dst.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x_src, x_dst, rel_pos, src[..., None], dst[..., None], edge_mask[..., None], ori_grid, *weights)
    return out[:B]


def weights_from_flax(params: dict, fiber_basis: jnp.ndarray, conv_scope: str, basis_scope: str = "basis_fn") -> HEPiConvWeights:
    """Extract HEPiConvWeights from a HEPi Flax param tree.

    params: the HEPi module's params dict (params['params'] level).
    fiber_basis: [O, O, A] orientation-invariant basis (edge independent),
    contracted here with the conv's fiber_kernel Dense into fk [O, O, C].
    conv_scope: e.g. "processor_0_internal".
    """
    basis = params[basis_scope]
    conv = params[conv_scope]
    fk = jnp.einsum("opa,ac->opc", fiber_basis.astype(jnp.float32), conv["fiber_kernel"]["kernel"].astype(jnp.float32))
    ln = conv["LayerNorm_0"]
    return HEPiConvWeights(
        w1=basis["Dense_0"]["kernel"].astype(jnp.float32),
        b1=basis["Dense_0"]["bias"].astype(jnp.float32),
        w2=basis["Dense_1"]["kernel"].astype(jnp.float32),
        b2=basis["Dense_1"]["bias"].astype(jnp.float32),
        wk=conv["kernel"]["kernel"].astype(jnp.float32),
        fk=fk,
        bias=conv["bias"].astype(jnp.float32),
        ln_scale=ln["scale"].astype(jnp.float32),
        ln_bias=ln["bias"].astype(jnp.float32),
        wm1=conv["Dense_0"]["kernel"].astype(jnp.float32),
        bm1=conv["Dense_0"]["bias"].astype(jnp.float32),
        wm2=conv["Dense_1"]["kernel"].astype(jnp.float32),
        bm2=conv["Dense_1"]["bias"].astype(jnp.float32),
    )
