"""Fused HEPi FiberBundleConv message pass as a Pallas TPU kernel (v2).

The XLA path (models/ponita.FiberBundleConv) materializes the [B, E, O, C]
edge tensors (gathered neighbours, messages) in HBM between fusions — the
dominant cost of the HEPi collection forward on v5e.

v1 of this kernel (git history, `d99a50b`) fused EVERYTHING including the
in-kernel polynomial basis MLP and lost 2.2x to XLA: f32 operand DMA and
Mosaic lane-layout constraints made the basis stage alone cost ~6 ms
(lane-width-2/14 tensors, 16-way slice/concat storms). v2 splits the work
by what each engine is good at:

  - XLA PROLOGUE (dense, no gather): invariants -> polynomial basis MLP ->
    spatial kernel `kern = basis @ W_k` as whole-batch bf16 einsums. These
    matmuls are MXU-shaped already; XLA fuses them well.
  - PALLAS KERNEL (the part XLA is bad at): gather -> message -> scatter ->
    fiber conv -> ConvNeXt for a TILE of envs entirely in VMEM, bf16
    operands with f32 MXU accumulation. The [TB*E, O, C] edge tensors never
    touch HBM; traffic collapses to kern + node latents.

Layout decisions (see /opt/skills/guides/pallas_guide.md):
  - grid = (B / TB,): each program owns TB envs (default 16); gather/scatter
    are BLOCK-DIAGONAL one-hot matmuls [TB*E, TB*N] x [TB*N, C] per
    orientation — K = TB*N >= 128 keeps the MXU full.
  - everything lives in [rows, C] form (lane dim C = 64/128); per-orientation
    work is static slices over the O axis and row-major reshapes only.
  - bf16 operand DMA halves the HBM traffic of v1; one-hot matrices are bf16
    (0/1 exact), accumulation is f32 via preferred_element_type.

Numerics mirror FiberBundleConv (depthwise, use_bias=True); parity is gated
by tests/test_pallas_hepi.py against the Flax module. Used for the
COLLECTION/EVAL forward only (policy sampling inside the rollout scan); the
update path keeps the XLA implementation, so no custom VJP is needed.

Reference: geometry_rl/modules/pyg_models/ponita/conv.py:64-157 (the op
being fused), hepi.py:109-123 (invariants, computed in the XLA prologue).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class HEPiConvWeights(NamedTuple):
    """Per-conv post-message parameters, all f32, laid out for the kernel.

    fk [O, P, C]: fiber kernel (PRE-APPLIED Dense of the fiber basis,
    computed once in XLA — tiny and edge-independent); conv bias [C];
    LayerNorm ln_scale/ln_bias [C]; ConvNeXt MLP wm1 [C, WF*C], bm1,
    wm2 [WF*C, C], bm2.
    """

    fk: jnp.ndarray
    bias: jnp.ndarray
    ln_scale: jnp.ndarray
    ln_bias: jnp.ndarray
    wm1: jnp.ndarray
    bm1: jnp.ndarray
    wm2: jnp.ndarray
    bm2: jnp.ndarray


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
    x_src_ref,  # [TB, Ns, O, C] bf16
    x_dst_ref,  # [TB, Nd, O, C] bf16
    kern_ref,  # [TB, E, O, C] bf16 (precomputed spatial kernel)
    src_ref,  # [TB, E, 1] int32
    dst_ref,  # [TB, E, 1] int32
    mask_ref,  # [TB, E, 1]
    fk_ref,
    bias_ref,
    lns_ref,
    lnb_ref,
    wm1_ref,
    bm1_ref,
    wm2_ref,
    bm2_ref,
    out_ref,  # [TB, Nd, O, C]
    *,
    tb: int,
    ns: int,
    nd: int,
    e: int,
    o: int,
    c: int,
    compute_dtype,
):
    f32 = jnp.float32
    bf16 = compute_dtype  # operand dtype (bf16 in production, f32 in parity tests)
    acc = dict(preferred_element_type=f32)

    src_idx = src_ref[...].reshape(tb, e)
    dst_idx = dst_ref[...].reshape(tb, e)
    oh_src = _block_one_hot(src_idx, ns, tb, bf16)  # [TBE, TB*Ns]
    oh_dst = _block_one_hot(dst_idx, nd, tb, bf16)  # [TBE, TB*Nd]
    mask_rows = mask_ref[...].astype(f32).reshape(tb * e, 1)

    x_src = x_src_ref[...]  # [TB, Ns, O, C] bf16
    kern = kern_ref[...]  # [TB, E, O, C] bf16

    # ---- per-orientation gather -> message -> scatter (MXU matmuls) -------
    x1_blocks = []  # per-o [TB*Nd, C] f32
    for oo in range(o):
        xs_o = jax.lax.slice_in_dim(x_src, oo, oo + 1, axis=2).reshape(tb * ns, c)
        x_j = jax.lax.dot_general(oh_src, xs_o, (((1,), (0,)), ((), ())), **acc)  # [TBE, C] f32
        kern_o = jax.lax.slice_in_dim(kern, oo, oo + 1, axis=2).reshape(tb * e, c)
        msg = (kern_o.astype(f32) * x_j * mask_rows).astype(bf16)
        x1_blocks.append(
            jax.lax.dot_general(oh_dst, msg, (((0,), (0,)), ((), ())), **acc)  # [TB*Nd, C] f32
        )

    # ---- fiber (orientation) conv + ConvNeXt, per output orientation p ----
    fk = fk_ref[...].astype(f32)  # [O, P, C]
    x_dst = x_dst_ref[...]  # [TB, Nd, O, C] bf16
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
            jax.lax.dot_general(hn.astype(bf16), wm1_ref[...], (((1,), (0,)), ((), ())), **acc)
            + bm1_ref[...]
        )
        hm = (
            jax.lax.dot_general(hm.astype(bf16), wm2_ref[...], (((1,), (0,)), ((), ())), **acc)
            + bm2_ref[...]
        )

        xd_p = jax.lax.slice_in_dim(x_dst, p, p + 1, axis=2).reshape(tb * nd, c).astype(f32)
        out_ref[:, :, p : p + 1, :] = (xd_p + hm).reshape(tb, nd, 1, c).astype(out_ref.dtype)


def hepi_conv_fused(
    x_src: jnp.ndarray,  # [B, Ns, O, C]
    x_dst: jnp.ndarray,  # [B, Nd, O, C]
    kern: jnp.ndarray,  # [B, E, O, C] precomputed spatial kernel (XLA prologue)
    src: jnp.ndarray,  # [B, E] int32
    dst: jnp.ndarray,  # [B, E] int32
    edge_mask: jnp.ndarray,  # [B, E]
    w: HEPiConvWeights,
    *,
    tile_envs: int = 16,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused depthwise FiberBundleConv message pass. Returns updated x_dst."""
    B, Ns, O, C = x_src.shape
    Nd = x_dst.shape[1]
    E = src.shape[1]
    x_src = x_src.astype(compute_dtype)
    x_dst_b = x_dst.astype(compute_dtype)
    kern = kern.astype(compute_dtype)
    w = w._replace(wm1=w.wm1.astype(compute_dtype), wm2=w.wm2.astype(compute_dtype))

    tb = min(tile_envs, B)
    if B % tb:  # pad env axis to a tile multiple
        pad = tb - B % tb
        x_src = jnp.concatenate([x_src, x_src[:pad]], 0)
        x_dst_b = jnp.concatenate([x_dst_b, x_dst_b[:pad]], 0)
        kern = jnp.concatenate([kern, kern[:pad]], 0)
        src = jnp.concatenate([src, src[:pad]], 0)
        dst = jnp.concatenate([dst, dst[:pad]], 0)
        edge_mask = jnp.concatenate([edge_mask, edge_mask[:pad]], 0)
    Bp = x_src.shape[0]

    kernel = partial(_conv_kernel, tb=tb, ns=Ns, nd=Nd, e=E, o=O, c=C, compute_dtype=compute_dtype)

    def env_block(shape):
        return pl.BlockSpec((tb,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM)

    def shared(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    weights = [w.fk, w.bias, w.ln_scale, w.ln_bias, w.wm1, w.bm1, w.wm2, w.bm2]
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tb,),
        in_specs=[
            env_block((Ns, O, C)),
            env_block((Nd, O, C)),
            env_block((E, O, C)),
            env_block((E, 1)),
            env_block((E, 1)),
            env_block((E, 1)),
            *[shared(x) for x in weights],
        ],
        out_specs=env_block((Nd, O, C)),
        out_shape=jax.ShapeDtypeStruct((Bp, Nd, O, C), x_dst.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x_src, x_dst_b, kern, src[..., None], dst[..., None], edge_mask[..., None], *weights)
    return out[:B]


def weights_from_flax(params: dict, fiber_basis: jnp.ndarray, conv_scope: str) -> HEPiConvWeights:
    """Extract HEPiConvWeights from a HEPi Flax param tree.

    params: the HEPi module's params dict (params['params'] level).
    fiber_basis: [O, O, A] orientation-invariant basis (edge independent),
    contracted here with the conv's fiber_kernel Dense into fk [O, O, C].
    conv_scope: e.g. "processor_0_internal".
    """
    conv = params[conv_scope]
    fk = jnp.einsum(
        "opa,ac->opc",
        fiber_basis.astype(jnp.float32),
        conv["fiber_kernel"]["kernel"].astype(jnp.float32),
    )
    ln = conv["LayerNorm_0"]
    return HEPiConvWeights(
        fk=fk,
        bias=conv["bias"].astype(jnp.float32),
        ln_scale=ln["scale"].astype(jnp.float32),
        ln_bias=ln["bias"].astype(jnp.float32),
        wm1=conv["Dense_0"]["kernel"].astype(jnp.float32),
        bm1=conv["Dense_0"]["bias"].astype(jnp.float32),
        wm2=conv["Dense_1"]["kernel"].astype(jnp.float32),
        bm2=conv["Dense_1"]["bias"].astype(jnp.float32),
    )
