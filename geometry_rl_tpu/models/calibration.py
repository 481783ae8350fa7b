"""One-shot kernel calibration for PONITA convolutions.

The reference re-initializes conv kernels on the FIRST training step so that
the spatial and fiber convolutions preserve feature standard deviation
(`callibrate`, ponita/conv.py:151-157: kernel *= std_in/std_1,
fiber_kernel *= std_1/std_2). A mutable-buffer side effect is unidiomatic
under jit; here the same rescaling is an explicit functional pass over the
initialized parameters, run once before training:

    params = calibrate(model, params, graph, feats)

It works for any model whose convs `sow` std_in/std_1/std_2 into the
"calibration" collection (FiberBundleConv, SeparableFiberBundleConvNext).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def _walk_and_scale(params: Dict, calib: Dict) -> Dict:
    out = {}
    for key, sub in params.items():
        if key in calib and isinstance(sub, dict):
            c = calib[key]
            if "std_in" in c:
                std_in = c["std_in"][0]
                std_1 = jnp.maximum(c["std_1"][0], 1e-8)
                std_2 = jnp.maximum(c["std_2"][0], 1e-8)
                new_sub = dict(sub)
                if "kernel" in new_sub:
                    k = dict(new_sub["kernel"])
                    k["kernel"] = k["kernel"] * (std_in / std_1)
                    new_sub["kernel"] = k
                if "fiber_kernel" in new_sub:
                    fk = dict(new_sub["fiber_kernel"])
                    fk["kernel"] = fk["kernel"] * (std_1 / std_2)
                    new_sub["fiber_kernel"] = fk
                # recurse for nested convs too (none today, harmless)
                out[key] = _walk_and_scale(new_sub, c)
                continue
            out[key] = _walk_and_scale(sub, c) if isinstance(sub, dict) else sub
        else:
            out[key] = sub
    return out


def calibrate(model, params: Any, *args, **kwargs) -> Any:
    """Run one forward pass, read the sown activation stds, and rescale every
    conv's kernel/fiber_kernel so each stage preserves feature std.

    Returns variables containing ONLY the "params" collection (any stale
    "calibration" collection from `init` is dropped — sown stats must not
    live in the train state)."""
    clean = {"params": params["params"]}
    _, collections = model.apply(clean, *args, mutable=["calibration"], **kwargs)
    calib = collections.get("calibration", {})
    if not calib:
        return clean
    return {"params": _walk_and_scale(clean["params"], calib)}
