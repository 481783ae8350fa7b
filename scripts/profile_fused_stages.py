import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
"""Stage bisection of the fused HEPi conv kernel: time truncated variants
(stop after basis / after gather-scatter / full) to find the hot stage."""

import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import geometry_rl_tpu.ops.pallas_hepi as PH

B, Ns, Nd, E, O, C = 1024, 32, 32, 96, 16, 64
TB = 8
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 10)
x_src = jax.random.normal(ks[0], (B, Ns, O, C))
x_dst = jax.random.normal(ks[1], (B, Nd, O, C))
rel = jax.random.normal(ks[2], (B, E, 3))
src = jax.random.randint(ks[3], (B, E), 0, Ns)
dst = jax.random.randint(ks[4], (B, E), 0, Nd)
mask = jnp.ones((B, E))
ori = jax.random.normal(ks[5], (O, 3))
ori = ori / jnp.linalg.norm(ori, axis=-1, keepdims=True)
w = PH.HEPiConvWeights(
    w1=jax.random.normal(ks[6], (14, C)) * 0.1,
    b1=jnp.zeros(C),
    w2=jax.random.normal(ks[7], (C, C)) * 0.1,
    b2=jnp.zeros(C),
    wk=jax.random.normal(ks[8], (C, C)) * 0.1,
    fk=jax.random.normal(ks[9], (O, O, C)) * 0.1,
    bias=jnp.zeros(C),
    ln_scale=jnp.ones(C),
    ln_bias=jnp.zeros(C),
    wm1=jax.random.normal(ks[6], (C, 4 * C)) * 0.1,
    bm1=jnp.zeros(4 * C),
    wm2=jax.random.normal(ks[7], (4 * C, C)) * 0.1,
    bm2=jnp.zeros(C),
)


def timeit(f, n=20):
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def make_kernel(stage):
    def kern(x_src_ref, x_dst_ref, rel_ref, src_ref, dst_ref, mask_ref, ori_ref,
             w1_ref, b1_ref, w2_ref, b2_ref, wk_ref, fk_ref, bias_ref, lns_ref,
             lnb_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref, out_ref,
             *, tb, ns, nd, e, o, c):
        f32 = jnp.float32
        src_idx = src_ref[...].reshape(tb, e)
        dst_idx = dst_ref[...].reshape(tb, e)
        relv = rel_ref[...].astype(f32).reshape(tb * e, 3)
        oriv = ori_ref[...].astype(f32)
        inv1 = jax.lax.dot_general(relv, oriv.T, (((1,), (0,)), ((), ())))
        rel_sq = jnp.sum(relv * relv, axis=-1, keepdims=True)
        inv2 = jnp.sqrt(jnp.maximum(rel_sq - inv1 * inv1, 0.0))
        if stage == "invariants":
            v = jax.lax.slice_in_dim(inv1, 0, tb * nd, axis=0)  # [tb*nd, O]
            v = jnp.sum(v, axis=-1, keepdims=True)
            out_ref[:, :, 0:1, 0:1] = v.reshape(tb, nd, 1, 1)
            return
        si = jnp.concatenate(
            [jnp.concatenate([jax.lax.slice_in_dim(inv1, oo, oo + 1, axis=1),
                              jax.lax.slice_in_dim(inv2, oo, oo + 1, axis=1)], axis=-1)
             for oo in range(o)], axis=0)
        feats = PH._poly2_ref(si)
        h = jax.nn.gelu(jax.lax.dot_general(feats, w1_ref[...], (((1,), (0,)), ((), ()))) + b1_ref[...])
        basis = jax.nn.gelu(jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ()))) + b2_ref[...])
        kern_w = jax.lax.dot_general(basis, wk_ref[...], (((1,), (0,)), ((), ())))
        if stage == "basis":
            v = jax.lax.slice_in_dim(kern_w, 0, tb * nd, axis=0)  # [tb*nd, C]
            out_ref[:, :, 0:1, :] = v.reshape(tb, nd, 1, c).astype(out_ref.dtype)
            return
        oh_src = PH._block_one_hot(src_idx, ns, tb, f32)
        oh_dst = PH._block_one_hot(dst_idx, nd, tb, f32)
        mask_rows = mask_ref[...].astype(f32).reshape(tb * e, 1)
        x_srcv = x_src_ref[...].astype(f32)
        x1_blocks = []
        for oo in range(o):
            xs_o = jax.lax.slice_in_dim(x_srcv, oo, oo + 1, axis=2).reshape(tb * ns, c)
            x_j = jax.lax.dot_general(oh_src, xs_o, (((1,), (0,)), ((), ())))
            kern_o = jax.lax.slice_in_dim(kern_w, oo * tb * e, (oo + 1) * tb * e, axis=0)
            msg = kern_o * x_j * mask_rows
            x1_blocks.append(jax.lax.dot_general(oh_dst, msg, (((0,), (0,)), ((), ()))))
        if stage == "scatter":
            for p in range(o):
                out_ref[:, :, p : p + 1, :] = x1_blocks[p].reshape(tb, nd, 1, c).astype(out_ref.dtype)
            return
        fk = fk_ref[...].astype(f32)
        x_dstv = x_dst_ref[...].astype(f32)
        for p in range(o):
            x2_p = jnp.zeros((tb * nd, c), f32)
            for oo in range(o):
                fk_op = jax.lax.slice_in_dim(jax.lax.slice_in_dim(fk, oo, oo + 1, axis=0), p, p + 1, axis=1).reshape(1, c)
                x2_p = x2_p + x1_blocks[oo] * fk_op
            x2_p = x2_p / float(o) + bias_ref[...]
            if stage == "fiber":
                out_ref[:, :, p : p + 1, :] = x2_p.reshape(tb, nd, 1, c).astype(out_ref.dtype)
                continue
            mu = jnp.mean(x2_p, axis=-1, keepdims=True)
            var = jnp.mean((x2_p - mu) ** 2, axis=-1, keepdims=True)
            hn = (x2_p - mu) * jax.lax.rsqrt(var + 1e-6) * lns_ref[...] + lnb_ref[...]
            hm = jax.nn.gelu(jax.lax.dot_general(hn, wm1_ref[...], (((1,), (0,)), ((), ()))) + bm1_ref[...])
            hm = jax.lax.dot_general(hm, wm2_ref[...], (((1,), (0,)), ((), ()))) + bm2_ref[...]
            xd_p = jax.lax.slice_in_dim(x_dstv, p, p + 1, axis=2).reshape(tb * nd, c)
            out_ref[:, :, p : p + 1, :] = (xd_p + hm).reshape(tb, nd, 1, c).astype(out_ref.dtype)

    return partial(kern, tb=TB, ns=Ns, nd=Nd, e=E, o=O, c=C)


def run(stage):
    def env_block(shape):
        return pl.BlockSpec((TB,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM)

    def shared(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    weights = [w.w1, w.b1, w.w2, w.b2, w.wk, w.fk, w.bias, w.ln_scale, w.ln_bias, w.wm1, w.bm1, w.wm2, w.bm2]
    f = pl.pallas_call(
        make_kernel(stage),
        grid=(B // TB,),
        in_specs=[env_block((Ns, O, C)), env_block((Nd, O, C)), env_block((E, 3)),
                  env_block((E, 1)), env_block((E, 1)), env_block((E, 1)),
                  shared(ori), *[shared(x) for x in weights]],
        out_specs=env_block((Nd, O, C)),
        out_shape=jax.ShapeDtypeStruct((B, Nd, O, C), x_dst.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    gj = jax.jit(lambda a, b: f(a, b, rel, src[..., None], dst[..., None], mask[..., None], ori, *weights))
    g = lambda: gj(x_src, x_dst)
    print(f"{stage:12s}: {timeit(g):.2f} ms", flush=True)


for stage in ["invariants", "basis", "scatter", "fiber", "full"]:
    run(stage)
