"""Native C++ scene builder vs the NumPy oracle (native/scene_build.cpp)."""

import math
import os
import subprocess

import numpy as np
import pytest

from elaina_tpu.geometry import bvh as BV
from elaina_tpu.geometry import native as NT

pytestmark = pytest.mark.skipif(
    not (NT.available() or os.path.exists(
        os.path.join(os.path.dirname(__file__), "..", "native",
                     "scene_build.cpp"))),
    reason="native sources missing")


def _ensure_built():
    if NT.available():
        return True
    root = os.path.join(os.path.dirname(__file__), "..", "native")
    try:
        subprocess.run(["make", "-C", root], check=True, capture_output=True)
    except Exception:
        return False
    NT._LIB = None
    return NT.available()


def _scene_2d():
    t = np.linspace(0, 2 * math.pi, 501)[:-1]
    r = 3 + np.cos(7 * t)
    verts = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(500), (np.arange(500) + 1) % 500], -1).astype(np.int32)
    return verts, idx


def test_native_bvh_matches_numpy():
    if not _ensure_built():
        pytest.skip("toolchain unavailable")
    verts, idx = _scene_2d()
    b_nat = NT.build_bvh_native(verts, idx)
    b_py = BV.build_bvh(verts, idx)
    np.testing.assert_allclose(b_nat.bb_min, b_py.bb_min, rtol=1e-6)
    np.testing.assert_allclose(b_nat.bb_max, b_py.bb_max, rtol=1e-6)
    np.testing.assert_array_equal(b_nat.left, b_py.left)
    np.testing.assert_array_equal(b_nat.right, b_py.right)
    np.testing.assert_array_equal(b_nat.start, b_py.start)
    np.testing.assert_array_equal(b_nat.count, b_py.count)
    assert b_nat.depth == b_py.depth


def test_native_silhouettes_match_numpy():
    if not _ensure_built():
        pytest.skip("toolchain unavailable")
    verts, idx = _scene_2d()
    s_nat = NT.silhouette_entities_native(verts, idx)
    s_py = BV.silhouette_entities(verts, idx)
    assert s_nat["p0"].shape == s_py["p0"].shape
    assert s_nat["always"].sum() == s_py["always"].sum()
    # order-independent comparison: sort entities by position
    for s in (s_nat, s_py):
        order = np.lexsort((s["p0"][:, 1], s["p0"][:, 0]))
        for k in s:
            s[k] = s[k][order]
    np.testing.assert_allclose(s_nat["p0"], s_py["p0"], atol=1e-6)
    # adjacent normal *pairs* may be stored in either order
    pair_nat = np.sort(np.stack([s_nat["n1"], s_nat["n2"]], 1), axis=1)
    pair_py = np.sort(np.stack([s_py["n1"], s_py["n2"]], 1), axis=1)
    np.testing.assert_allclose(pair_nat, pair_py, atol=1e-5)


def test_native_obj_roundtrip(tmp_path):
    if not _ensure_built():
        pytest.skip("toolchain unavailable")
    path = tmp_path / "t.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "l 1 2 3\nf 1 2 3 4\n")
    from elaina_tpu.geometry.obj import load_obj as py_load
    v_n, i_n = NT.load_obj_native(str(path), 2)
    v_p, i_p = py_load(str(path), 2)
    np.testing.assert_array_equal(v_n, v_p)
    np.testing.assert_array_equal(i_n, i_p)
    v_n3, i_n3 = NT.load_obj_native(str(path), 3)
    v_p3, i_p3 = py_load(str(path), 3)
    np.testing.assert_array_equal(i_n3, i_p3)  # fan triangulation


def test_native_grid_bands_match_device_passes():
    """Native BVH-pruned band passes (grid_band_counts/rows) agree with the
    device O(cells x prims) passes, and the resulting grid stays EXACT for
    closest-point queries (VERDICT r2 #3: cold-start grid build)."""
    import os

    import jax.numpy as jnp

    from elaina_tpu.geometry.grid import build_candidate_grid, grid_closest_point
    from elaina_tpu.geometry.native import grid_bands_available
    from elaina_tpu.geometry.primitives import seg_closest_point, tri_closest_point

    if not grid_bands_available():
        import pytest
        pytest.skip("native library not built")

    rng = np.random.default_rng(31)

    # 2D segments
    t = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    r = 3 + np.sin(7 * t)
    verts2 = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    idx2 = np.stack([np.arange(200), (np.arange(200) + 1) % 200],
                    -1).astype(np.int32)
    # 3D triangles
    centers3 = rng.uniform(-3, 3, (80, 3)).astype(np.float32)
    offs3 = rng.uniform(-0.5, 0.5, (80, 3, 3)).astype(np.float32)
    verts3 = (centers3[:, None] + offs3).reshape(-1, 3)
    idx3 = np.arange(240, dtype=np.int32).reshape(-1, 3)

    for verts, idx, dim in ((verts2, idx2, 2), (verts3, idx3, 3)):
        lo = np.full(dim, -4.5, np.float32)
        hi = np.full(dim, 4.5, np.float32)
        os.environ["ELAINA_NATIVE_GRID"] = "1"
        try:
            g_nat = build_candidate_grid(verts, idx, lo, hi, K=48, max_res=64)
            os.environ["ELAINA_NATIVE_GRID"] = "0"
            g_dev = build_candidate_grid(verts, idx, lo, hi, K=48, max_res=64)
        finally:
            os.environ["ELAINA_NATIVE_GRID"] = "1"

        assert g_nat.res == g_dev.res
        if dim == 2:
            # identical bound formulas: near-identical bands (tie prims at
            # the exact threshold may differ in f32 — compare per-row SETS)
            assert len(g_nat.meta) == len(g_dev.meta)
            cn = np.asarray(g_nat.cand)
            cd = np.asarray(g_dev.cand)
            assert cn.shape == cd.shape
            same = (np.sort(cn, 1) == np.sort(cd, 1)).all(1)
            assert same.mean() > 0.98, f"{1 - same.mean():.3%} differ"
        # 3D: the native pass uses TIGHTER (corner-exact upper) bounds than
        # the device pass's center±h, so bands legitimately shrink — the
        # brute-force exactness check below is the correctness property

        # the property that matters: closest-point through the native grid
        # is exact against brute force
        q = jnp.asarray(rng.uniform(-4.5, 4.5, (400, dim)), jnp.float32)
        d, _ = grid_closest_point(g_nat, jnp.asarray(verts),
                                  jnp.asarray(idx), q)
        if dim == 2:
            a, b = verts[idx[:, 0]][None], verts[idx[:, 1]][None]
            db = np.asarray(jnp.min(seg_closest_point(
                np.asarray(q)[:, None, :], a, b)[0], axis=1))
        else:
            a, b, c = (verts[idx[:, k]][None] for k in range(3))
            db = np.asarray(jnp.min(tri_closest_point(
                np.asarray(q)[:, None, :], a, b, c)[0], axis=1))
        np.testing.assert_allclose(np.asarray(d), db, rtol=2e-5, atol=2e-5)
