"""Hierarchical Neumann-side queries on large primitive sets: the coned-BVH
closest-silhouette descent and the BVH-descent Green-weighted in-ball
sampling must agree with the exact dense sweeps (snch-lbvh
nearest_silhouette / sample_object_in_sphere parity, SURVEY.md §2.1,
uniform/integrator.cu:189,349-365)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.geometry import queries as Q
from elaina_tpu.geometry.geomset import make_geom_set


def _wavy_circle(n, r0=3.0, amp=0.6, waves=12):
    t = np.linspace(0, 2 * math.pi, n, endpoint=False)
    r = r0 + amp * np.sin(waves * t)
    verts = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(n), (np.arange(n) + 1) % n], -1).astype(np.int32)
    return verts, idx


def _open_arcs(n_arcs, per_arc):
    """Many disjoint open arcs: every arc endpoint is an always-silhouette
    entity (hole border)."""
    rng = np.random.default_rng(5)
    verts, idx = [], []
    base = 0
    for a in range(n_arcs):
        c = rng.uniform(-4, 4, 2)
        r = rng.uniform(0.2, 0.6)
        t0 = rng.uniform(0, 2 * math.pi)
        t = t0 + np.linspace(0, 1.5, per_arc + 1)
        v = c + r * np.stack([np.cos(t), np.sin(t)], -1)
        verts.append(v)
        idx.append(np.stack([np.arange(per_arc), np.arange(per_arc) + 1],
                            -1) + base)
        base += per_arc + 1
    return (np.concatenate(verts).astype(np.float32),
            np.concatenate(idx).astype(np.int32))


def _dense_silhouette(gs, q):
    """Reference O(E) sweep (the pre-hierarchy implementation)."""
    p0, p1 = gs.sil_p0, gs.sil_p1
    if gs.dim == 2:
        c = p0[None, :, :]
        d = jnp.linalg.norm(q[:, None, :] - c, axis=-1)
        v = q[:, None, :] - c
    else:
        from elaina_tpu.geometry.primitives import seg_closest_point
        d, t = seg_closest_point(q[:, None, :], p0[None], p1[None])
        cc = p0[None] + t[..., None] * (p1 - p0)[None]
        v = q[:, None, :] - cc
    s1 = jnp.sum(gs.sil_n1[None] * v, axis=-1)
    s2 = jnp.sum(gs.sil_n2[None] * v, axis=-1)
    is_sil = gs.sil_always[None] | (s1 * s2 <= 0.0)
    return jnp.min(jnp.where(is_sil, d, jnp.inf), axis=-1)


@pytest.mark.parametrize("mesh", ["wavy", "arcs"])
def test_coned_bvh_silhouette_matches_dense(mesh):
    if mesh == "wavy":
        verts, idx = _wavy_circle(12000)
    else:
        verts, idx = _open_arcs(1500, 8)  # 12000 prims, hole borders
    gs, _ = make_geom_set(verts, idx)
    assert gs.n_prims >= 10_000
    assert gs.sil_bb_min is not None    # hierarchy built above threshold

    q = jnp.asarray(np.random.default_rng(7).uniform(-5, 5, (400, 2)),
                    jnp.float32)
    d_bvh = jax.jit(Q.closest_silhouette)(gs, q)
    d_ref = _dense_silhouette(gs, q)
    np.testing.assert_allclose(np.asarray(d_bvh), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)


def test_coned_bvh_silhouette_3d():
    rng = np.random.default_rng(11)
    import sys
    sys.path.insert(0, "tools")
    from make_scene3d import make_mesh
    verts, idx = make_mesh(4)           # 5120 tris -> ~7680 edges
    gs, _ = make_geom_set(verts, idx)
    if gs.sil_bb_min is None:
        pytest.skip("entity count under hierarchy threshold")
    q = jnp.asarray(rng.uniform(-1.5, 1.5, (200, 3)), jnp.float32)
    d_bvh = jax.jit(Q.closest_silhouette)(gs, q)
    d_ref = _dense_silhouette(gs, q)
    np.testing.assert_allclose(np.asarray(d_bvh), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)


def test_bvh_sample_in_ball_unbiased():
    """The BVH-descent sampler is a valid importance sampler: for every
    sample, w_true(idx) / pdf has expectation sum_i w_true(i) (the dense
    total) — the exact quantity the Neumann estimator divides by."""
    from elaina_tpu.solver.green import GREEN_R_CLAMP, green_eval

    verts, idx = _wavy_circle(12000)
    gs, _ = make_geom_set(verts, idx)
    assert gs.node_measure is not None

    rng = np.random.default_rng(3)
    n = 16
    q = jnp.asarray(rng.uniform(-3, 3, (n, 2)), jnp.float32)
    R = jnp.asarray(rng.uniform(0.5, 2.0, (n,)), jnp.float32)

    # dense truth: total Green-weighted measure per query
    a = verts[idx[:, 0]][None]
    b = verts[idx[:, 1]][None]
    from elaina_tpu.geometry.primitives import seg_closest_point
    d, _ = seg_closest_point(np.asarray(q)[:, None, :], a, b)
    meas = np.asarray(gs.prim_measure)[None]
    gw = np.asarray(green_eval(jnp.maximum(jnp.asarray(d), GREEN_R_CLAMP),
                               R[:, None], 2))
    w_true = np.where(d < np.asarray(R)[:, None], meas * np.maximum(gw, 0), 0)
    totals = w_true.sum(-1)

    m = 4000
    u = jnp.asarray(rng.uniform(0, 1, (m * n,)), jnp.float32)
    q_rep = jnp.tile(q, (m, 1))
    R_rep = jnp.tile(R, (m,))
    pid, pdf = jax.jit(Q.sample_in_ball)(gs, q_rep, R_rep, u)
    pid = np.asarray(pid).reshape(m, n)
    pdf = np.asarray(pdf).reshape(m, n)
    chosen = pid >= 0
    # every chosen prim must really overlap its lane's ball
    lanes = np.broadcast_to(np.arange(n)[None], (m, n))
    assert np.all(np.asarray(d)[lanes[chosen], pid[chosen]]
                  < np.asarray(R)[lanes[chosen]] + 1e-5)
    wt = np.where(chosen,
                  w_true[lanes, np.maximum(pid, 0)]
                  / np.asarray(gs.prim_measure)[np.maximum(pid, 0)], 0.0)
    est = (wt / np.maximum(pdf, 1e-30)).mean(0)
    # queries with nothing in the ball must return -1 / est 0
    empty = totals <= 0
    assert np.all(est[empty] == 0)
    live = ~empty
    rel = np.abs(est[live] - totals[live]) / np.maximum(totals[live], 1e-30)
    # 4000 samples: the descent proposal tracks the true weights closely,
    # a few percent Monte Carlo error remains
    assert np.all(rel < 0.08), rel


def test_silhouette_grid_lower_bound_and_exactness():
    """SilGrid banded query (VERDICT r2 next #5): always a valid LOWER
    bound on the true silhouette distance, and EXACT wherever the true
    distance lies below the cell's validity cap — in both 2D and 3D."""
    import numpy as np

    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.geometry.grid import build_silhouette_grid
    from elaina_tpu.geometry.native import sil_bands_available
    from elaina_tpu.geometry.queries import (closest_silhouette,
                                             grid_closest_silhouette)

    if not sil_bands_available():
        pytest.skip("native library not built")

    rng = np.random.default_rng(41)

    # 2D: wavy closed curve (vertex entities with adjacent normals)
    t = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    r = 3 + 0.8 * np.sin(9 * t)
    v2 = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    i2 = np.stack([np.arange(400), (np.arange(400) + 1) % 400],
                  -1).astype(np.int32)

    # 3D: bumpy sphere (edge entities)
    from tests.test_wost_3d import _cube_boundary
    v3, i3 = _cube_boundary(n=10)
    bump = 1.0 + 0.15 * np.sin(5 * v3[:, 0]) * np.cos(4 * v3[:, 1])
    v3 = (v3 * bump[:, None]).astype(np.float32)

    for verts, idx, dim in ((v2, i2, 2), (v3, i3, 3)):
        gs, _ = make_geom_set(verts, idx)
        lo = verts.min(0) - 0.5
        hi = verts.max(0) + 0.5
        sg = build_silhouette_grid(
            np.asarray(gs.sil_p0), np.asarray(gs.sil_p1),
            np.asarray(gs.sil_n1), np.asarray(gs.sil_n2),
            np.asarray(gs.sil_always), lo, hi, K=24)
        assert sg is not None

        q = jnp.asarray(rng.uniform(lo - 0.3, hi + 0.3, (600, dim)),
                        jnp.float32)
        got = np.asarray(grid_closest_silhouette(sg, gs, q))
        true = np.asarray(closest_silhouette(gs, q))

        # valid lower bound everywhere
        assert np.all(got <= true * (1 + 1e-5) + 1e-5), (
            dim, float((got - true).max()))
        # exact below the cell cap (in-grid lanes)
        res = np.asarray(sg.res, np.float32)
        rel = (np.asarray(q) - np.asarray(sg.origin)) * np.asarray(sg.inv_cell)
        inside = np.all((rel >= 0) & (rel < res), axis=-1)
        cidx = np.clip(rel.astype(np.int64), 0, (res - 1).astype(np.int64))
        lin = cidx[:, 0]
        for d in range(1, dim):
            lin = lin * sg.res[d] + cidx[:, d]
        cap = np.asarray(sg.r_cap)[lin]
        tight = inside & (true < cap * 0.999) & np.isfinite(true)
        assert tight.sum() > 100        # the test must exercise exact lanes
        np.testing.assert_allclose(got[tight], true[tight],
                                   rtol=1e-4, atol=1e-4)


def test_silhouette_grid_pallas_sweep_matches_gather():
    """sil_band_dma (interpret mode) must match the gather formulation of
    grid_closest_silhouette exactly, in 2D and 3D — same rows, same r_cap
    clamp, always-entities kept unconditionally via the n1=0 encoding."""
    import os

    import numpy as np

    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.geometry.grid import build_silhouette_grid
    from elaina_tpu.geometry.native import sil_bands_available
    from elaina_tpu.geometry.queries import grid_closest_silhouette

    if not sil_bands_available():
        pytest.skip("native library not built")

    rng = np.random.default_rng(53)

    t = np.linspace(0, 2 * np.pi, 300, endpoint=False)
    r = 2 + 0.6 * np.sin(7 * t)
    v2 = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    i2 = np.stack([np.arange(300), (np.arange(300) + 1) % 300],
                  -1).astype(np.int32)

    from tests.test_wost_3d import _cube_boundary
    v3, i3 = _cube_boundary(n=8)
    bump = 1.0 + 0.2 * np.sin(4 * v3[:, 0]) * np.cos(3 * v3[:, 2])
    v3 = (v3 * bump[:, None]).astype(np.float32)

    for verts, idx, dim in ((v2, i2, 2), (v3, i3, 3)):
        gs, _ = make_geom_set(verts, idx)
        lo = verts.min(0) - 0.4
        hi = verts.max(0) + 0.4
        q = jnp.asarray(rng.uniform(lo - 0.2, hi + 0.2, (500, dim)),
                        jnp.float32)

        os.environ["ELAINA_PALLAS_INTERPRET"] = "1"
        try:
            sg = build_silhouette_grid(
                np.asarray(gs.sil_p0), np.asarray(gs.sil_p1),
                np.asarray(gs.sil_n1), np.asarray(gs.sil_n2),
                np.asarray(gs.sil_always), lo, hi, K=24)
            assert sg is not None and sg.coords is not None
            got_kernel = np.asarray(grid_closest_silhouette(sg, gs, q))
        finally:
            os.environ["ELAINA_PALLAS_INTERPRET"] = "0"

        # gather path on the identical grid
        from dataclasses import replace as _rep
        got_gather = np.asarray(grid_closest_silhouette(
            _rep(sg, coords=None), gs, q))
        np.testing.assert_allclose(got_kernel, got_gather,
                                   rtol=1e-5, atol=1e-6)
