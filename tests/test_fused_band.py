"""Fused Neumann band step (ops/pallas_queries.band_neumann_walk_dma_3d)
vs the three-kernel composition it replaces.

The fused kernel runs the in-ball Green-weighted CDF sample, the sample
point's visibility ray, and the walk ray off ONE per-lane cell-block DMA
and extracts the winners' geometry in-tile; it must be a drop-in
equivalent of band_sample_in_ball + prim_sample_point + two
band_ray_intersect calls + the vertex/normal gathers.  CDF boundaries
can flip under f32 reassociation (triangular-matmul prefix sums vs
jnp.cumsum), so comparisons allow a sub-percent slot-mismatch tail like
tests/test_band_dma.py.  Reference counterpart: sampleNeumannImpl +
oneStepWalkImpl (uniform/integrator.cu:318-445, 447-526).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import elaina_tpu.geometry.queries as Q
from elaina_tpu.geometry.geomset import make_geom_set
from elaina_tpu.geometry.grid import build_prim_band_grid
from elaina_tpu.geometry.native import prim_bands_available
from elaina_tpu.geometry.primitives import (prim_project, prim_sample_point,
                                            prim_side)

pytestmark = pytest.mark.skipif(not prim_bands_available(),
                                reason="native prim_band_rows unavailable")


@pytest.fixture()
def soup(monkeypatch):
    monkeypatch.setenv("ELAINA_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(17)
    n_tri = 160
    centers = rng.uniform(-2, 2, (n_tri, 3)).astype(np.float32)
    offs = rng.uniform(-0.35, 0.35, (n_tri, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(3 * n_tri, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -3, np.float32)
    hi = np.full(3, 3, np.float32)
    gs, _ = make_geom_set(verts, idx)
    bg = build_prim_band_grid(verts, idx, lo, hi, K=16, max_res=6)
    assert bg.coords is not None
    return gs, bg, rng


def _gather_pv(gs, pid):
    safe = np.maximum(np.asarray(pid), 0)
    v = np.asarray(gs.verts)
    i = np.asarray(gs.indices)[safe]
    return tuple(jnp.asarray(v[i[:, k]]) for k in range(3))


def test_fused_wrapper_matches_unfused(soup):
    gs, bg, rng = soup
    n = 1024
    eps = 0.01
    q = rng.uniform(-3.2, 3.2, (n, 3)).astype(np.float32)
    R = np.asarray(Q.band_r_cap(bg, jnp.asarray(q))) * 0.9
    R = np.maximum(np.minimum(R, 1.8), 1e-3).astype(np.float32)
    on_n = rng.random(n) < 0.3
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = np.where(on_n[:, None], nrm, 0.0).astype(np.float32)
    u_sel = rng.uniform(0, 1, n).astype(np.float32)
    u_pt = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    d_walk = rng.normal(size=(n, 3)).astype(np.float32)
    d_walk /= np.linalg.norm(d_walk, axis=-1, keepdims=True)

    out = Q.band_neumann_walk(bg, gs, jnp.asarray(q), jnp.asarray(R),
                              jnp.asarray(on_n), jnp.asarray(nrm),
                              jnp.asarray(u_sel), jnp.asarray(u_pt),
                              jnp.asarray(d_walk), eps)

    # ---- unfused composition on the SAME band rows ----
    pid_u, pdf_u = Q.band_sample_in_ball(bg, gs, jnp.asarray(q),
                                         jnp.asarray(R), jnp.asarray(u_sel))
    pid_u, pdf_u = np.asarray(pid_u), np.asarray(pdf_u)
    pid_f = np.asarray(out.pid)
    valid = pid_u >= 0
    assert valid.sum() > n // 8
    np.testing.assert_array_equal(pid_f >= 0, valid)
    match = (pid_f == pid_u) | ~valid
    assert match.mean() > 0.995, f"{(~match).sum()} slot mismatches"
    sel = match & valid
    np.testing.assert_allclose(np.asarray(out.pdf_area)[sel], pdf_u[sel],
                               rtol=2e-4)

    pv = _gather_pv(gs, pid_u)
    sp_u = np.asarray(prim_sample_point(3, pv, jnp.asarray(u_pt[:, 0]),
                                        jnp.asarray(u_pt[:, 1])))
    np.testing.assert_allclose(np.asarray(out.sample_pt)[sel], sp_u[sel],
                               rtol=1e-4, atol=1e-5)
    side_u = np.asarray(prim_side(3, jnp.asarray(q), pv))
    np.testing.assert_array_equal(np.asarray(out.side)[sel], side_u[sel])
    # plane normal orientation matches the precomputed prim normal
    pn = np.asarray(gs.prim_normal)[np.maximum(pid_u, 0)]
    dots = np.sum(np.asarray(out.plane_n) * pn, axis=-1)
    assert np.all(dots[sel] > 0)
    # in-kernel barycentrics == prim_project of the sample point
    su = np.sqrt(u_pt[:, 0])
    b1 = u_pt[:, 1] * su
    uv_k = np.stack([b1, su - b1], -1)
    uv_u = np.asarray(prim_project(3, jnp.asarray(sp_u), pv))
    np.testing.assert_allclose(uv_k[sel], uv_u[sel], atol=2e-4)

    # visibility ray
    origin = q + np.where(on_n[:, None], eps * nrm, 0.0).astype(np.float32)
    ray = sp_u - origin
    dist = np.linalg.norm(ray, axis=-1)
    rd = ray / np.maximum(dist, 1e-20)[:, None]
    occ_u, _, _ = Q.band_ray_intersect(
        bg, gs, jnp.asarray(origin), jnp.asarray(rd),
        jnp.asarray(dist - eps, jnp.float32), ref=jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(out.occluded)[sel],
                                  np.asarray(occ_u)[sel])

    # walk ray
    whit_u, wt_u, wpid_u = Q.band_ray_intersect(
        bg, gs, jnp.asarray(origin), jnp.asarray(d_walk),
        jnp.asarray(R), ref=jnp.asarray(q))
    whit_u = np.asarray(whit_u)
    np.testing.assert_array_equal(np.asarray(out.whit), whit_u)
    np.testing.assert_allclose(np.asarray(out.wt)[whit_u],
                               np.asarray(wt_u)[whit_u], rtol=1e-5)
    wn = np.asarray(gs.prim_normal)[np.asarray(wpid_u)]
    cosang = np.abs(np.sum(np.asarray(out.wnormal) * wn, axis=-1))
    np.testing.assert_allclose(cosang[whit_u], 1.0, atol=1e-4)


def _mixed_cube_scene_banded():
    from tests.test_wost_3d import (_colors_from_fn, _cube_boundary,
                                    _scene3)
    from elaina_tpu.core.problem import Boundary

    d_verts, d_tris = _cube_boundary(n=3, faces=(0, 1))
    d_gs, _ = make_geom_set(d_verts, d_tris)
    d_colors = _colors_from_fn(d_verts, lambda v: (v[0] + 1.0) / 2.0)
    n_verts, n_tris = _cube_boundary(n=3, faces=(2, 3, 4, 5))
    n_gs, _ = make_geom_set(n_verts, n_tris)
    scene = _scene3(
        dirichlet=Boundary(gs=d_gs, colors=jnp.asarray(d_colors)),
        neumann=Boundary(gs=n_gs,
                         colors=jnp.zeros((len(n_verts), 2, 3),
                                          jnp.float32)))
    bg = build_prim_band_grid(n_verts, n_tris,
                              np.full(3, -1.1, np.float32),
                              np.full(3, 1.1, np.float32), K=24, max_res=8)
    return dataclasses.replace(scene, n_bgrid=bg)


def test_fused_step_matches_unfused(monkeypatch):
    """wost_depth_step with the fused kernel == the three-kernel path,
    same keys, lane for lane (modulo the CDF-flip tail)."""
    monkeypatch.setenv("ELAINA_PALLAS_INTERPRET", "1")
    from elaina_tpu.solver.wost import init_walk_state, wost_depth_step

    scene = _mixed_cube_scene_banded()
    rng = np.random.default_rng(5)
    n = 512
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (n, 3)), jnp.float32)

    def run(steps=3):
        st = init_walk_state(pts, jnp.ones((n,), bool))
        key = jax.random.PRNGKey(7)
        acc = jnp.zeros((n, 3))
        for it in range(steps):
            st, c = wost_depth_step(scene, st, jax.random.fold_in(key, it),
                                    0.02, 32, 32)
            acc = acc + c
        return np.asarray(acc), st

    monkeypatch.setenv("ELAINA_FUSED_BAND", "0")
    acc_u, st_u = run()
    monkeypatch.setenv("ELAINA_FUSED_BAND", "1")
    acc_f, st_f = run()

    pos_match = np.all(np.isclose(np.asarray(st_f.pos), np.asarray(st_u.pos),
                                  rtol=1e-4, atol=1e-5), axis=-1)
    acc_match = np.all(np.isclose(acc_f, acc_u, rtol=1e-3, atol=1e-6),
                       axis=-1)
    assert pos_match.mean() > 0.99, f"{(~pos_match).sum()} pos mismatches"
    assert acc_match.mean() > 0.99, f"{(~acc_match).sum()} acc mismatches"
    np.testing.assert_array_equal(np.asarray(st_f.active),
                                  np.asarray(st_u.active))
    on_match = np.asarray(st_f.on_neumann) == np.asarray(st_u.on_neumann)
    assert on_match.mean() > 0.99


def test_fused_mixed_cube_e2e(monkeypatch):
    """Short fused solve still matches the analytic u = (x+1)/2."""
    monkeypatch.setenv("ELAINA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("ELAINA_FUSED_BAND", "1")
    from elaina_tpu.solver.wost import init_walk_state, wost_depth_step

    scene = _mixed_cube_scene_banded()
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.3, -0.4]], jnp.float32)
    ptsr = jnp.repeat(pts, 48, axis=0)
    n = ptsr.shape[0]
    key = jax.random.PRNGKey(3)
    total = jnp.zeros((n, 3))
    for s in range(12):
        st = init_walk_state(ptsr, jnp.ones((n,), bool))
        contrib = jnp.zeros((n, 3))
        kk = jax.random.fold_in(key, s)
        for it in range(48):
            st, c = wost_depth_step(scene, st, jax.random.fold_in(kk, it),
                                    0.03, 32, 32)
            contrib = contrib + c
        total = total + contrib
    u = np.asarray(total / 12).reshape(2, 48, 3).mean(axis=1)
    expected = (np.asarray(pts)[:, 0] + 1.0) / 2.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.12)
