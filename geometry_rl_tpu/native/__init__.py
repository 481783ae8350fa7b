"""Native host runtime: ctypes bindings for libgeomrl_native.

Builds on first import (g++ is in the image; pybind11 is not, so the C ABI +
ctypes is the binding layer). Every entry point has a numpy fallback so the
framework works even without a toolchain; `HAVE_NATIVE` reports which path is
active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "geomrl_native.cpp")
_LIB = os.path.join(_DIR, "libgeomrl_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    i64, i32p, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)
    lib.knn_graph.restype = i64
    lib.knn_graph.argtypes = [f32p, i64, i64, i64, i32p]
    lib.knn_graph_batch.restype = None
    lib.knn_graph_batch.argtypes = [f32p, i32p, i64, i64, i64, i32p, i32p, f32p]
    lib.edges_from_faces.restype = i64
    lib.edges_from_faces.argtypes = [i32p, i64, i32p]
    lib.diag_kl_project.restype = None
    lib.diag_kl_project.argtypes = [f32p, f32p, f32p, i64, i64, f32p]
    lib.polygon_sdf.restype = None
    lib.polygon_sdf.argtypes = [f32p, i64, f32p, i64, f32p]
    _lib = lib
    return lib


def _f32(x):
    return np.ascontiguousarray(x, dtype=np.float32)


def _i32(x):
    return np.ascontiguousarray(x, dtype=np.int32)


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


HAVE_NATIVE = _load() is not None


def knn_graph(points: np.ndarray, num_valid: int, k: int) -> np.ndarray:
    """Directed kNN edges (src, dst) like PyG knn_graph; [num_valid*k, 2]."""
    lib = _load()
    if lib is None:
        from ..graphs.rigid import knn_edges_np

        return knn_edges_np(np.asarray(points), num_valid, k)
    pts = _f32(points)
    kk = min(k, max(num_valid - 1, 0))
    out = np.zeros((num_valid * max(kk, 1), 2), np.int32)
    n = lib.knn_graph(
        _ptr(pts, ctypes.POINTER(ctypes.c_float)),
        pts.shape[0],
        num_valid,
        k,
        _ptr(out, ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:n]


def knn_graph_batch(points: np.ndarray, num_valid: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Padded batched topology: points [S, P, 3], counts [S] ->
    (src [S, P*k], dst [S, P*k], mask [S, P*k])."""
    lib = _load()
    S, P = points.shape[:2]
    if lib is None:
        from ..graphs.rigid import knn_edges_np

        src = np.zeros((S, P * k), np.int32)
        dst = np.zeros((S, P * k), np.int32)
        mask = np.zeros((S, P * k), np.float32)
        for s in range(S):
            e = knn_edges_np(np.asarray(points[s]), int(num_valid[s]), k)
            src[s, : len(e)] = e[:, 0]
            dst[s, : len(e)] = e[:, 1]
            mask[s, : len(e)] = 1.0
        return src, dst, mask
    pts = _f32(points)
    nv = _i32(num_valid)
    src = np.zeros((S, P * k), np.int32)
    dst = np.zeros((S, P * k), np.int32)
    mask = np.zeros((S, P * k), np.float32)
    lib.knn_graph_batch(
        _ptr(pts, ctypes.POINTER(ctypes.c_float)),
        _ptr(nv, ctypes.POINTER(ctypes.c_int32)),
        S,
        P,
        k,
        _ptr(src, ctypes.POINTER(ctypes.c_int32)),
        _ptr(dst, ctypes.POINTER(ctypes.c_int32)),
        _ptr(mask, ctypes.POINTER(ctypes.c_float)),
    )
    return src, dst, mask


def edges_from_faces(faces: np.ndarray) -> np.ndarray:
    """Unique undirected edges from triangle faces [F, 3] -> [E, 2]."""
    lib = _load()
    f = _i32(faces)
    if lib is None:
        edges = set()
        for a, b, c in f:
            for u, v in ((a, b), (b, c), (c, a)):
                edges.add((min(u, v), max(u, v)))
        return np.asarray(sorted(edges), np.int32).reshape(-1, 2)
    out = np.zeros((f.shape[0] * 3, 2), np.int32)
    n = lib.edges_from_faces(
        _ptr(f, ctypes.POINTER(ctypes.c_int32)), f.shape[0], _ptr(out, ctypes.POINTER(ctypes.c_int32))
    )
    return out[:n]


def diag_kl_project(var: np.ndarray, old_var: np.ndarray, eps) -> np.ndarray:
    """Native reference solve of the diagonal KL covariance projection
    (ITPAL BatchedDiagCovOnlyProjection role)."""
    lib = _load()
    v = _f32(var)
    vo = _f32(old_var)
    e = _f32(np.broadcast_to(np.asarray(eps, np.float32), v.shape[:1]))
    if lib is None:
        raise RuntimeError("native library unavailable; use the JAX projection")
    out = np.zeros_like(v)
    lib.diag_kl_project(
        _ptr(v, ctypes.POINTER(ctypes.c_float)),
        _ptr(vo, ctypes.POINTER(ctypes.c_float)),
        _ptr(e, ctypes.POINTER(ctypes.c_float)),
        v.shape[0],
        v.shape[1],
        _ptr(out, ctypes.POINTER(ctypes.c_float)),
    )
    return out


def polygon_sdf(verts: np.ndarray, query: np.ndarray) -> np.ndarray:
    lib = _load()
    v = _f32(verts)
    q = _f32(query)
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.zeros(q.shape[0], np.float32)
    lib.polygon_sdf(
        _ptr(v, ctypes.POINTER(ctypes.c_float)),
        v.shape[0],
        _ptr(q, ctypes.POINTER(ctypes.c_float)),
        q.shape[0],
        _ptr(out, ctypes.POINTER(ctypes.c_float)),
    )
    return out
