"""Radius-complete prim band grid (grid.PrimBandGrid): the TPU-native
Neumann query path (in-ball sampling / ray intersect / visibility over
ONE band row, with the star radius clamped to the row's completeness
cap).  Reference counterpart: uniform/integrator.cu:318-445 + the lbvh
ray / sample_object_in_sphere traversals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import elaina_tpu.geometry.queries as Q
from elaina_tpu.geometry.geomset import make_geom_set
from elaina_tpu.geometry.grid import build_prim_band_grid
from elaina_tpu.geometry.native import prim_bands_available
from elaina_tpu.solver.green import GREEN_R_CLAMP, green_eval

pytestmark = pytest.mark.skipif(not prim_bands_available(),
                                reason="native prim_band_rows unavailable")


def _soup3d(n_tri=220, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2, 2, (n_tri, 3)).astype(np.float32)
    offs = rng.uniform(-0.3, 0.3, (n_tri, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(3 * n_tri, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -3, np.float32)
    hi = np.full(3, 3, np.float32)
    gs, _ = make_geom_set(verts, idx)
    bg = build_prim_band_grid(verts, idx, lo, hi, K=16, max_res=6)
    return gs, bg, verts, idx


def _pt_tri(p, A, B, C):
    ab, ac, ap = B - A, C - A, p - A
    d1, d2 = ab @ ap, ac @ ap
    if d1 <= 0 and d2 <= 0:
        return np.linalg.norm(ap)
    bp = p - B
    d3, d4 = ab @ bp, ac @ bp
    if d3 >= 0 and d4 <= d3:
        return np.linalg.norm(bp)
    vc = d1 * d4 - d3 * d2
    if vc <= 0 and d1 >= 0 and d3 <= 0:
        return np.linalg.norm(ap - (d1 / (d1 - d3)) * ab)
    cp = p - C
    d5, d6 = ab @ cp, ac @ cp
    if d6 >= 0 and d5 <= d6:
        return np.linalg.norm(cp)
    vb = d5 * d2 - d1 * d6
    if vb <= 0 and d2 >= 0 and d6 <= 0:
        return np.linalg.norm(ap - (d2 / (d2 - d6)) * ac)
    va = d3 * d6 - d5 * d4
    if va <= 0 and (d4 - d3) >= 0 and (d5 - d6) >= 0:
        w = (d4 - d3) / ((d4 - d3) + (d5 - d6))
        return np.linalg.norm(p - (B + w * (C - B)))
    den = 1.0 / (va + vb + vc)
    return np.linalg.norm(p - (A + ab * (vb * den) + ac * (vc * den)))


def test_band_completeness_property():
    """The guarantee the solver relies on: for any q in a cell and any
    R <= r_cap, every prim intersecting ball(q, R) is in the row."""
    gs, bg, verts, idx = _soup3d()
    a, b, c3 = (verts[idx[:, 0]].astype(np.float64),
                verts[idx[:, 1]].astype(np.float64),
                verts[idx[:, 2]].astype(np.float64))
    rows = np.asarray(bg.rows)
    rcap = np.asarray(bg.r_cap)
    origin = np.asarray(bg.origin)
    cell = 1.0 / np.asarray(bg.inv_cell)
    res = bg.res
    rng = np.random.default_rng(1)
    checked = 0
    for ci in rng.choice(rows.shape[0], 50, replace=False):
        iz = ci % res[2]
        iy = (ci // res[2]) % res[1]
        ix = ci // (res[1] * res[2])
        c = origin + (np.array([ix, iy, iz]) + 0.5) * cell
        inside = set(rows[ci][rows[ci] >= 0].tolist())
        for _ in range(4):
            q = c + rng.uniform(-0.4995, 0.4995, 3) * cell
            R = min(rcap[ci], 3.0) * rng.uniform(0.5, 0.999)
            for p in range(len(idx)):
                if _pt_tri(q, a[p], b[p], c3[p]) <= R - 1e-5:
                    checked += 1
                    assert p in inside, (ci, p)
    assert checked > 100          # the test must actually exercise hits


def test_band_ray_matches_dense_within_cap():
    gs, bg, verts, idx = _soup3d()
    rng = np.random.default_rng(7)
    n = 1024
    o = rng.uniform(-2.8, 2.8, (n, 3)).astype(np.float32)
    # half the rays aim at the NEAREST triangle's centroid (random rays
    # in a sparse soup rarely hit inside the rcap-bounded tmax)
    cent = verts[idx].mean(1)
    near = np.argmin(((o[:, None, :] - cent[None]) ** 2).sum(-1), axis=1)
    d = rng.normal(size=(n, 3))
    aimed = cent[near] - o + rng.normal(scale=0.05, size=(n, 3))
    d[: n // 2] = aimed[: n // 2]
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    o = jnp.asarray(o)
    tmax = Q.band_r_cap(bg, o) * 0.95
    tmax = jnp.minimum(tmax, 2.5)
    hit_b, t_b, pid_b = Q.band_ray_intersect(bg, gs, o, d, tmax)
    hit_r, t_r, pid_r = Q.ray_intersect(gs, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(hit_r))
    hb = np.asarray(hit_b)
    assert hb.sum() > 20
    np.testing.assert_allclose(np.asarray(t_b)[hb], np.asarray(t_r)[hb],
                               rtol=1e-5, atol=1e-5)


def test_band_sample_in_ball_matches_dense_pdf():
    """Same weight field => the band pick's pdf must equal the dense
    path's exact pdf for the picked prim (pick order differs: the row is
    heap-ordered, so indices differ while the DISTRIBUTION matches)."""
    gs, bg, verts, idx = _soup3d()
    rng = np.random.default_rng(9)
    n = 512
    q = jnp.asarray(rng.uniform(-2.8, 2.8, (n, 3)), jnp.float32)
    R = Q.band_r_cap(bg, q) * 0.95
    R = jnp.minimum(R, 2.0)
    u = jnp.asarray(rng.uniform(size=n), jnp.float32)
    pid, pdf = Q.band_sample_in_ball(bg, gs, q, R, u)
    pid, pdf = np.asarray(pid), np.asarray(pdf)
    ok = pid >= 0
    assert ok.sum() > 50

    # exact dense weights
    a, b, c3 = verts[idx[:, 0]], verts[idx[:, 1]], verts[idx[:, 2]]
    from elaina_tpu.geometry.primitives import prim_closest_point
    dall = np.asarray(prim_closest_point(
        3, np.asarray(q)[:, None, :],
        (jnp.asarray(a)[None], jnp.asarray(b)[None],
         jnp.asarray(c3)[None]))[0])
    Rn = np.asarray(R)
    gw = np.asarray(green_eval(jnp.maximum(jnp.asarray(dall),
                                           GREEN_R_CLAMP),
                               jnp.asarray(Rn)[:, None], 3))
    w = np.where(dall < Rn[:, None],
                 np.asarray(gs.prim_measure)[None] * np.maximum(gw, 0), 0.0)
    total = w.sum(-1)
    lanes = np.arange(n)
    w_sel = w[lanes, np.maximum(pid, 0)]
    m_sel = np.asarray(gs.prim_measure)[np.maximum(pid, 0)]
    assert np.all(w_sel[ok] > 0)
    np.testing.assert_allclose(
        pdf[ok], w_sel[ok] / (total[ok] * m_sel[ok]), rtol=2e-4)
    # lanes with mass must pick (and vice versa)
    np.testing.assert_array_equal(ok, total > 1e-30)


def test_band_solve_matches_plain_neumann():
    """e2e: a mixed-BC uniform solve with the band grid active matches
    the plain (dense-query) solve's analytic expectation — the R_B clamp
    costs steps, never correctness."""
    import dataclasses

    from elaina_tpu.core.problem import Boundary
    from elaina_tpu.solver.wost import init_walk_state, wost_depth_step
    from tests.test_wost_uniform import (_colors_from_fn, _scene,
                                         _square_boundary)

    d_verts, d_idx = _square_boundary(n_per_side=6, sides=(1, 3))
    d_gs, _ = make_geom_set(d_verts, d_idx)
    d_colors = _colors_from_fn(d_verts, lambda v: (v[0] + 1) / 2)
    n_verts, n_idx = _square_boundary(n_per_side=24, sides=(0, 2))
    n_gs, _ = make_geom_set(n_verts, n_idx)
    scene = _scene(
        dirichlet=Boundary(gs=d_gs, colors=jnp.asarray(d_colors)),
        neumann=Boundary(gs=n_gs,
                         colors=jnp.zeros((len(n_verts), 2, 3),
                                          jnp.float32)))
    bg = build_prim_band_grid(n_verts, n_idx,
                              np.asarray(scene.aabb_lo) - 0.1,
                              np.asarray(scene.aabb_hi) + 0.1,
                              K=12, max_res=16)
    scene_b = dataclasses.replace(scene, n_bgrid=bg)

    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.uniform(-0.7, 0.7, (256, 2)), jnp.float32)
    expected = (np.asarray(pts)[:, 0] + 1.0) / 2.0

    def solve(sc, spp=48, depth=48, eps=0.02):
        total = jnp.zeros((256, 3))
        step = jax.jit(lambda sc, st, k: wost_depth_step(
            sc, st, k, eps, 32, 32))
        for s in range(spp):
            st = init_walk_state(pts, jnp.ones((256,), bool))
            key = jax.random.PRNGKey(s)
            contrib = jnp.zeros((256, 3))
            for it in range(depth):
                st, c = step(sc, st, jax.random.fold_in(key, it))
                contrib = contrib + c
            total = total + contrib
        return np.asarray(total / spp)

    u_b = solve(scene_b)
    err_b = np.abs(u_b[:, 0] - expected).mean()
    assert err_b < 0.06, err_b
    assert np.isfinite(u_b).all()
