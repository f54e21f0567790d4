"""ctypes bindings for the native C++ scene builder (native/scene_build.cpp).

Runtime counterpart of the reference's native geometry-engine host side
(snch-lbvh build, SURVEY.md §2.1).  Falls back to the NumPy implementations
in geometry/{obj,bvh}.py when the shared library is absent; the NumPy path
also serves as the correctness oracle in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .bvh import BVHArrays

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libelaina_scene.so")


class _ObjData(ctypes.Structure):
    _fields_ = [("verts", ctypes.POINTER(ctypes.c_float)),
                ("segs", ctypes.POINTER(ctypes.c_int32)),
                ("tris", ctypes.POINTER(ctypes.c_int32)),
                ("n_verts", ctypes.c_int64),
                ("n_segs", ctypes.c_int64),
                ("n_tris", ctypes.c_int64)]


class _BvhOut(ctypes.Structure):
    _fields_ = [("bb_min", ctypes.POINTER(ctypes.c_float)),
                ("bb_max", ctypes.POINTER(ctypes.c_float)),
                ("left", ctypes.POINTER(ctypes.c_int32)),
                ("right", ctypes.POINTER(ctypes.c_int32)),
                ("start", ctypes.POINTER(ctypes.c_int32)),
                ("count", ctypes.POINTER(ctypes.c_int32)),
                ("order", ctypes.POINTER(ctypes.c_int32)),
                ("n_nodes", ctypes.c_int64),
                ("depth", ctypes.c_int32)]


class _SilOut(ctypes.Structure):
    _fields_ = [("p0", ctypes.POINTER(ctypes.c_float)),
                ("p1", ctypes.POINTER(ctypes.c_float)),
                ("n1", ctypes.POINTER(ctypes.c_float)),
                ("n2", ctypes.POINTER(ctypes.c_float)),
                ("always", ctypes.POINTER(ctypes.c_uint8)),
                ("n_entities", ctypes.c_int64)]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.obj_load.restype = ctypes.POINTER(_ObjData)
    lib.obj_load.argtypes = [ctypes.c_char_p]
    lib.obj_free.argtypes = [ctypes.POINTER(_ObjData)]
    lib.bvh_build.restype = ctypes.POINTER(_BvhOut)
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.bvh_free.argtypes = [ctypes.POINTER(_BvhOut)]
    lib.silhouettes_build.restype = ctypes.POINTER(_SilOut)
    lib.silhouettes_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32]
    lib.silhouettes_free.argtypes = [ctypes.POINTER(_SilOut)]
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    if hasattr(lib, "grid_band_counts"):
        lib.grid_band_counts.restype = None
        lib.grid_band_counts.argtypes = [
            fp, ctypes.c_int64, ip, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, fp, ctypes.c_int64, fp, ip, fp]
        lib.grid_band_rows.restype = None
        lib.grid_band_rows.argtypes = [
            fp, ctypes.c_int64, ip, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, fp, ctypes.c_int64, fp, ctypes.c_int32, ip, fp]
    if hasattr(lib, "grid_band_full"):
        lib.grid_band_full.restype = None
        lib.grid_band_full.argtypes = [
            fp, ctypes.c_int64, ip, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, fp, ctypes.c_int64, fp, ctypes.c_int32, ip, ip,
            fp]
    if hasattr(lib, "sil_band_rows"):
        up = ctypes.POINTER(ctypes.c_uint8)
        lib.sil_band_rows.restype = None
        lib.sil_band_rows.argtypes = [
            fp, fp, fp, fp, up, ctypes.c_int64, ctypes.c_int32, fp,
            ctypes.c_int64, fp, ctypes.c_int32, ip, fp, fp]
    if hasattr(lib, "prim_band_rows"):
        lib.prim_band_rows.restype = None
        lib.prim_band_rows.argtypes = [
            fp, ctypes.c_int64, ip, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, fp, ctypes.c_int64, fp, ctypes.c_int32, ip, fp,
            fp]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_np(ptr, shape, dtype):
    n = int(np.prod(shape))
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)
    return arr.reshape(shape)


def load_obj_native(path: str, dim: int):
    lib = _load()
    d = lib.obj_load(path.encode())
    if not d:
        raise FileNotFoundError(path)
    try:
        c = d.contents
        verts = _as_np(c.verts, (int(c.n_verts), 3), np.float32)
        if dim == 2:
            verts = verts[:, :2].copy()
            indices = _as_np(c.segs, (int(c.n_segs), 2), np.int32)
        else:
            indices = _as_np(c.tris, (int(c.n_tris), 3), np.int32)
        if indices.shape[0] == 0:
            raise ValueError(f"{path}: no dim-{dim} primitives found")
        return verts, indices
    finally:
        lib.obj_free(d)


def build_bvh_native(verts: np.ndarray, indices: np.ndarray,
                     leaf_size: int = 4) -> BVHArrays:
    lib = _load()
    dim = verts.shape[1]
    v = np.ascontiguousarray(verts, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    out = lib.bvh_build(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), idx.shape[0],
        idx.shape[1], dim, leaf_size)
    try:
        c = out.contents
        M = int(c.n_nodes)
        return BVHArrays(
            bb_min=_as_np(c.bb_min, (M, dim), np.float32),
            bb_max=_as_np(c.bb_max, (M, dim), np.float32),
            left=_as_np(c.left, (M,), np.int32),
            right=_as_np(c.right, (M,), np.int32),
            start=_as_np(c.start, (M,), np.int32),
            count=_as_np(c.count, (M,), np.int32),
            prim_order=_as_np(c.order, (idx.shape[0],), np.int32),
            depth=int(c.depth),
        )
    finally:
        lib.bvh_free(out)


def silhouette_entities_native(verts: np.ndarray, indices: np.ndarray):
    lib = _load()
    dim = verts.shape[1]
    v = np.ascontiguousarray(verts, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    out = lib.silhouettes_build(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), idx.shape[0], dim)
    try:
        c = out.contents
        E = int(c.n_entities)
        return dict(
            p0=_as_np(c.p0, (E, dim), np.float32),
            p1=_as_np(c.p1, (E, dim), np.float32),
            n1=_as_np(c.n1, (E, dim), np.float32),
            n2=_as_np(c.n2, (E, dim), np.float32),
            always=_as_np(c.always, (E,), np.uint8).astype(bool),
        )
    finally:
        lib.silhouettes_free(out)


def grid_bands_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "grid_band_counts")


def grid_band_counts_native(verts: np.ndarray, indices: np.ndarray,
                            centers: np.ndarray, hcell: np.ndarray):
    """Native _count_pass: (counts (n,) int32, lcell (n,) float32).

    BVH-pruned per-cell band counting — the device pass is
    O(cells x prims) per level (192 s of the fille cold start)."""
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    c = np.ascontiguousarray(centers, np.float32)
    h = np.ascontiguousarray(hcell, np.float32)
    dim = v.shape[1]
    n = c.shape[0]
    counts = np.empty((n,), np.int32)
    lcell = np.empty((n,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.grid_band_counts(
        v.ctypes.data_as(fp), v.shape[0], idx.ctypes.data_as(ip),
        idx.shape[0], idx.shape[1], dim, c.ctypes.data_as(fp), n,
        h.ctypes.data_as(fp), counts.ctypes.data_as(ip),
        lcell.ctypes.data_as(fp))
    return counts, lcell


def grid_band_rows_native(verts: np.ndarray, indices: np.ndarray,
                          centers: np.ndarray, hcell: np.ndarray, K: int):
    """Native _band_pass: (rows (n, K) int32 -1-padded, lcell (n,) f32)."""
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    c = np.ascontiguousarray(centers, np.float32)
    h = np.ascontiguousarray(hcell, np.float32)
    dim = v.shape[1]
    n = c.shape[0]
    rows = np.empty((n, int(K)), np.int32)
    lcell = np.empty((n,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.grid_band_rows(
        v.ctypes.data_as(fp), v.shape[0], idx.ctypes.data_as(ip),
        idx.shape[0], idx.shape[1], dim, c.ctypes.data_as(fp), n,
        h.ctypes.data_as(fp), int(K), rows.ctypes.data_as(ip),
        lcell.ctypes.data_as(fp))
    return rows, lcell


def sil_bands_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "sil_band_rows")


def sil_band_rows_native(p0, p1, n1, n2, always, centers, hcell, K: int):
    """Native silhouette band-grid pass: per cell the K nearest (by lower
    bound) possibly-silhouette entities, the validity cap r_cap, and the
    lazy-skip lower bound.  See native/scene_build.cpp sil_band_rows."""
    lib = _load()
    p0 = np.ascontiguousarray(p0, np.float32)
    p1 = np.ascontiguousarray(p1, np.float32)
    n1 = np.ascontiguousarray(n1, np.float32)
    n2 = np.ascontiguousarray(n2, np.float32)
    aw = np.ascontiguousarray(always, np.uint8)
    c = np.ascontiguousarray(centers, np.float32)
    h = np.ascontiguousarray(hcell, np.float32)
    dim = p0.shape[1]
    n = c.shape[0]
    rows = np.empty((n, int(K)), np.int32)
    rcap = np.empty((n,), np.float32)
    lbound = np.empty((n,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    up = ctypes.POINTER(ctypes.c_uint8)
    lib.sil_band_rows(
        p0.ctypes.data_as(fp), p1.ctypes.data_as(fp), n1.ctypes.data_as(fp),
        n2.ctypes.data_as(fp), aw.ctypes.data_as(up), p0.shape[0], dim,
        c.ctypes.data_as(fp), n, h.ctypes.data_as(fp), int(K),
        rows.ctypes.data_as(ip), rcap.ctypes.data_as(fp),
        lbound.ctypes.data_as(fp))
    return rows, rcap, lbound


def prim_bands_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "prim_band_rows")


def prim_band_rows_native(verts, indices, centers, hcell, K: int):
    """Radius-complete K-nearest prim bands (the Neumann query grid):
    per cell the K prims with the smallest cell-lower-bound, the
    completeness cap r_cap (every prim with lower < r_cap is in the
    row), and the cell-min lower bound.  See scene_build.cpp
    prim_band_rows for the guarantee the solver relies on."""
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    c = np.ascontiguousarray(centers, np.float32)
    h = np.ascontiguousarray(hcell, np.float32)
    dim = v.shape[1]
    n = c.shape[0]
    rows = np.empty((n, int(K)), np.int32)
    rcap = np.empty((n,), np.float32)
    lbound = np.empty((n,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.prim_band_rows(
        v.ctypes.data_as(fp), v.shape[0], idx.ctypes.data_as(ip),
        idx.shape[0], idx.shape[1], dim, c.ctypes.data_as(fp), n,
        h.ctypes.data_as(fp), int(K), rows.ctypes.data_as(ip),
        rcap.ctypes.data_as(fp), lbound.ctypes.data_as(fp))
    return rows, rcap, lbound


def grid_band_full_native(verts: np.ndarray, indices: np.ndarray,
                          centers: np.ndarray, hcell: np.ndarray, K: int):
    """Fused count+rows+lcell in one native pass (best-first min-upper):
    (counts (n,) int32, rows (n, K) int32 -1-padded, lcell (n,) f32).
    Rows are only meaningful where counts <= K (over-K cells subdivide)."""
    lib = _load()
    v = np.ascontiguousarray(verts, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    c = np.ascontiguousarray(centers, np.float32)
    h = np.ascontiguousarray(hcell, np.float32)
    dim = v.shape[1]
    n = c.shape[0]
    counts = np.empty((n,), np.int32)
    rows = np.empty((n, int(K)), np.int32)
    lcell = np.empty((n,), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.grid_band_full(
        v.ctypes.data_as(fp), v.shape[0], idx.ctypes.data_as(ip),
        idx.shape[0], idx.shape[1], dim, c.ctypes.data_as(fp), n,
        h.ctypes.data_as(fp), int(K), counts.ctypes.data_as(ip),
        rows.ctypes.data_as(ip), lcell.ctypes.data_as(fp))
    return counts, rows, lcell
