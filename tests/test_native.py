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
