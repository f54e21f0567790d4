"""Candidate-grid accelerator: exactness vs brute force (geometry/grid.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from elaina_tpu.geometry.grid import build_candidate_grid, grid_closest_point
from elaina_tpu.geometry.primitives import seg_closest_point, tri_closest_point


def test_grid_exact_2d():
    t = np.linspace(0, 2 * math.pi, 400, endpoint=False)
    r = 3 + np.sin(5 * t)
    verts = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(400), (np.arange(400) + 1) % 400], -1).astype(np.int32)
    lo, hi = np.array([-5, -5], np.float32), np.array([5, 5], np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=40, max_res=512)
    assert float(grid.coverage) == 1.0

    q = jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (3000, 2)), jnp.float32)
    d, pid = grid_closest_point(grid, jnp.asarray(verts), jnp.asarray(idx), q)
    a, b = verts[idx[:, 0]][None], verts[idx[:, 1]][None]
    db = jnp.min(seg_closest_point(np.asarray(q)[:, None, :], a, b)[0], axis=1)
    np.testing.assert_allclose(np.asarray(d), np.asarray(db), rtol=1e-6, atol=1e-6)


def test_grid_pallas_dma_path_interpret():
    """The Pallas per-lane-DMA band sweep (interpret mode) matches the XLA
    grid path and brute force exactly."""
    t = np.linspace(0, 2 * math.pi, 400, endpoint=False)
    r = 3 + np.sin(5 * t)
    verts = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(400), (np.arange(400) + 1) % 400],
                   -1).astype(np.int32)
    lo, hi = np.array([-5, -5], np.float32), np.array([5, 5], np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=40, max_res=512)

    from elaina_tpu.geometry.grid import attach_coords, grid_cell_index
    from elaina_tpu.ops.pallas_queries import grid_band_dma_2d

    grid_c = attach_coords(grid, verts, idx)
    assert grid_c.coords.shape[1] % 8 == 0 and grid_c.coords.shape[2] == 128

    q = jnp.asarray(np.random.default_rng(2).uniform(-5, 5, (700, 2)),
                    jnp.float32)
    from elaina_tpu.geometry.grid import grid_row_index
    row = grid_row_index(grid_c, q)
    K = grid_c.cand.shape[1]
    d2, slot, (pax, pay, pbx, pby) = grid_band_dma_2d(
        row, q, grid_c.coords, -(-K // 128), interpret=True)
    pid = grid_c.cand[row, jnp.minimum(slot, K - 1)]
    # winning coords must match the pid's actual vertices
    np.testing.assert_allclose(np.asarray(pax), verts[idx[np.asarray(pid), 0], 0],
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(pby), verts[idx[np.asarray(pid), 1], 1],
                               rtol=0, atol=0)

    a, b = verts[idx[:, 0]][None], verts[idx[:, 1]][None]
    db = jnp.min(seg_closest_point(np.asarray(q)[:, None, :], a, b)[0], axis=1)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), np.asarray(db),
                               rtol=1e-5, atol=1e-6)
    # pid may differ from the XLA path only on exact ties (shared-vertex
    # equidistant segments): the chosen prim must attain the true distance
    a_sel = verts[idx[np.asarray(pid), 0]][:, None]
    b_sel = verts[idx[np.asarray(pid), 1]][:, None]
    d_sel = seg_closest_point(np.asarray(q)[:, None, :], a_sel, b_sel)[0][:, 0]
    np.testing.assert_allclose(d_sel, np.asarray(db), rtol=1e-5, atol=1e-5)


def test_device_coords_match_host_build():
    """_device_coords_from_cand (the TPU-side table build) reproduces the
    numpy coords_from_cand layout bit-for-bit, including -1 padding and
    row padding."""
    from elaina_tpu.geometry.grid import (_device_coords_from_cand,
                                          coords_from_cand)

    rng = np.random.default_rng(3)
    verts = rng.uniform(-4, 4, (37, 2)).astype(np.float32)
    idx = rng.integers(0, 37, (29, 2)).astype(np.int32)
    cand = rng.integers(-1, 29, (19, 40)).astype(np.int32)
    host = coords_from_cand(cand, verts, idx)
    dev = _device_coords_from_cand(jnp.asarray(cand), jnp.asarray(verts),
                                   jnp.asarray(idx), chunks=4)
    assert host.shape == dev.shape
    np.testing.assert_array_equal(host, np.asarray(dev))


def test_masked_dirichlet_distance():
    """dirichlet_distance_masked: exact where need, valid lower bound > eps
    elsewhere (so never falsely in-shell), on the interpret Pallas path."""
    import os

    t = np.linspace(0, 2 * math.pi, 300, endpoint=False)
    verts = np.stack([3 * np.cos(t), 3 * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(300), (np.arange(300) + 1) % 300],
                   -1).astype(np.int32)
    lo, hi = np.array([-5, -5], np.float32), np.array([5, 5], np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=64, max_res=256)

    from elaina_tpu.core.problem import Boundary, Scene
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.geometry.grid import attach_coords
    from elaina_tpu.solver.wost import dirichlet_distance_masked

    gs, _ = make_geom_set(verts, idx)
    scene = Scene(
        dirichlet=Boundary(gs=gs, colors=jnp.zeros((300, 2, 3))),
        neumann=None, d_grid=attach_coords(grid, verts, idx), source=None,
        aabb_lo=lo, aabb_hi=hi, dim=2, source_intensity=1.0,
        dirichlet_intensity=1.0, neumann_intensity=1.0)

    q = jnp.asarray(np.random.default_rng(5).uniform(-5, 5, (1500, 2)),
                    jnp.float32)
    active = jnp.arange(1500) % 5 != 0          # some dead lanes
    eps = 0.4
    os.environ["ELAINA_PALLAS_INTERPRET"] = "1"
    try:
        d, pid, pv, need = dirichlet_distance_masked(scene, q, active, eps, 32)
    finally:
        os.environ["ELAINA_PALLAS_INTERPRET"] = "0"

    a, b = verts[idx[:, 0]][None], verts[idx[:, 1]][None]
    d_true = np.asarray(jnp.min(
        seg_closest_point(np.asarray(q)[:, None, :], a, b)[0], axis=1))
    d = np.asarray(d)
    need = np.asarray(need)
    act = np.asarray(active)
    # where needed: exact
    np.testing.assert_allclose(d[need], d_true[need], rtol=1e-5, atol=1e-5)
    # active lanes not needed: valid lower bound, and provably out of shell
    skip = act & ~need
    assert np.all(d[skip] <= d_true[skip] + 1e-5)
    assert np.all(d[skip] >= eps)
    # every active lane possibly in the shell must be flagged as needed
    assert np.all(~(act & (d_true < eps)) | need)


def test_fine_pack_matches_meta_chain():
    """FinePack (dense finest-level packed table): row ids match the meta
    descent, the need bit matches the rl/diam test, and the quantized bound
    is a valid lower bound within one bucket of the leaf-cell bound."""
    t = np.linspace(0, 2 * math.pi, 300, endpoint=False)
    r = 3 + np.sin(7 * t)
    verts = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(300), (np.arange(300) + 1) % 300],
                   -1).astype(np.int32)
    lo, hi = np.array([-5, -5], np.float32), np.array([5, 5], np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=12, max_res=512)
    assert len(grid.meta) > 2   # exercise several refinement levels

    from elaina_tpu.geometry.grid import (attach_fine, fine_decode,
                                          grid_row_index)

    eps = 0.35
    grid_f = attach_fine(grid, eps)
    assert grid_f.fine is not None
    assert grid_f.fine.res == tuple(
        rr << (len(grid.meta) - 1) for rr in grid.res)

    q = jnp.asarray(np.random.default_rng(7).uniform(-4.99, 4.99, (4000, 2)),
                    jnp.float32)
    row_ref = np.asarray(grid_row_index(grid, q))
    row_f, need_f, rl_f, outside = (np.asarray(a)
                                    for a in fine_decode(grid_f.fine, q))
    assert not outside.any()
    np.testing.assert_array_equal(row_f, row_ref)

    # need bit == (decoded quantized bound < eps): rl_f is that decoded
    # bound, so the bit must match it exactly
    np.testing.assert_array_equal(need_f, rl_f < eps)
    # quantized bound: valid and within one bucket of the leaf bound
    rl_ref = np.asarray(grid.row_lbound)[row_ref]
    assert np.all(rl_f <= rl_ref + 1e-6)
    s = grid_f.fine.s
    tight = rl_ref > float(grid_f.fine.r0)   # bucket 0 (<= r0) maps to 0
    assert np.all(rl_f[tight] >= rl_ref[tight] * 2 ** (-2.0 / s) - 1e-5)

    # end-to-end masked query agrees with the chain path where exactness
    # is required
    from elaina_tpu.core.problem import Boundary, Scene
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.solver.wost import dirichlet_distance_masked

    gs, _ = make_geom_set(verts, idx)
    scene = Scene(
        dirichlet=Boundary(gs=gs, colors=jnp.zeros((300, 2, 3))),
        neumann=None, d_grid=grid_f, source=None,
        aabb_lo=lo, aabb_hi=hi, dim=2, source_intensity=1.0,
        dirichlet_intensity=1.0, neumann_intensity=1.0)
    active = jnp.ones((4000,), bool)
    d, pid, pv, need = dirichlet_distance_masked(scene, q, active, eps, 32)
    a, b = verts[idx[:, 0]][None], verts[idx[:, 1]][None]
    d_true = np.asarray(jnp.min(
        seg_closest_point(np.asarray(q)[:, None, :], a, b)[0], axis=1))
    d = np.asarray(d)
    need = np.asarray(need)
    np.testing.assert_allclose(d[need], d_true[need], rtol=1e-5, atol=1e-5)
    assert np.all(d[~need] <= d_true[~need] + 1e-5)
    assert np.all(d[~need] >= eps)
    assert np.all(~(d_true < eps) | need)


def test_grid_lbound_is_lower_bound():
    """The per-cell L grid lower-bounds the true distance everywhere."""
    t = np.linspace(0, 2 * math.pi, 200, endpoint=False)
    verts = np.stack([2 * np.cos(t), 2 * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(200), (np.arange(200) + 1) % 200],
                   -1).astype(np.int32)
    lo, hi = np.array([-4, -4], np.float32), np.array([4, 4], np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=32, max_res=256)

    from elaina_tpu.geometry.grid import grid_cell_index

    q = jnp.asarray(np.random.default_rng(3).uniform(-4, 4, (2000, 2)),
                    jnp.float32)
    lb = grid.lbound[grid_cell_index(grid, q)]
    a, b = verts[idx[:, 0]][None], verts[idx[:, 1]][None]
    d_true = jnp.min(seg_closest_point(np.asarray(q)[:, None, :], a, b)[0],
                     axis=1)
    assert bool(jnp.all(lb <= d_true + 1e-5))
    # and it is reasonably tight (within a cell diagonal)
    diag = float(np.linalg.norm(1.0 / np.asarray(grid.inv_cell)))
    assert bool(jnp.all(d_true - lb <= diag + 1e-5))


def test_grid_exact_3d():
    rng = np.random.default_rng(1)
    centers = rng.uniform(-3, 3, (120, 3)).astype(np.float32)
    offs = rng.uniform(-0.5, 0.5, (120, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(360, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -4, np.float32)
    hi = np.full(3, 4, np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=48, max_res=64)
    q = jnp.asarray(rng.uniform(-4, 4, (500, 3)), jnp.float32)
    d, pid = grid_closest_point(grid, jnp.asarray(verts), jnp.asarray(idx), q)
    a = verts[idx[:, 0]][None]
    b = verts[idx[:, 1]][None]
    c = verts[idx[:, 2]][None]
    db, _ = tri_closest_point(np.asarray(q)[:, None, :], a, b, c)
    db = jnp.min(db, axis=1)
    if float(grid.coverage) == 1.0:
        np.testing.assert_allclose(np.asarray(d), np.asarray(db), rtol=1e-5, atol=1e-5)
    else:  # band did not fit K at max_res: still expect near-exact results
        assert float(jnp.mean(jnp.abs(d - db) < 1e-4)) > 0.99


def _fast_path_scene(eps, n_verts=300, K=64, colors_seed=11):
    """Circle boundary scene with ALL round-2 fast-path attachments."""
    from elaina_tpu.core.problem import Boundary, Scene
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.geometry.grid import (attach_coords, attach_fine,
                                          attach_shading)

    t = np.linspace(0, 2 * math.pi, n_verts, endpoint=False)
    r = 3 + np.sin(5 * t)
    verts = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(n_verts), (np.arange(n_verts) + 1) % n_verts],
                   -1).astype(np.int32)
    lo, hi = np.array([-5, -5], np.float32), np.array([5, 5], np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=K, max_res=256)
    colors = np.asarray(
        np.random.default_rng(colors_seed).uniform(0, 1, (n_verts, 2, 3)),
        np.float32)

    g_fast = attach_shading(attach_fine(attach_coords(grid, verts, idx), eps),
                            colors, idx)
    assert (g_fast.fine is not None and g_fast.cpack is not None
            and g_fast.crows is not None)

    def scene_of(g):
        return Scene(
            dirichlet=Boundary(gs=make_geom_set(verts, idx)[0],
                               colors=jnp.asarray(colors)),
            neumann=None, d_grid=g, source=None,
            aabb_lo=lo, aabb_hi=hi, dim=2, source_intensity=1.0,
            dirichlet_intensity=1.0, neumann_intensity=1.0)

    return scene_of(g_fast), scene_of(grid), verts, idx


import pytest


@pytest.mark.parametrize("n", [1024, 4096])
def test_fused_resolve_matches_chain_path(n):
    """The round-2 fused bitmask resolve (_fast_dirichlet, interpret mode)
    agrees with the chain path on in-shell classification, exact R_D on
    resolved lanes, valid bounds elsewhere, and boundary colors.

    n=1024 drives the direct sweep, n=4096 the lane-compacted path."""
    import os

    from elaina_tpu.solver.wost import (_separate, fast_dirichlet_available,
                                        init_walk_state)

    eps = 0.35
    scene_fast, scene_ref, verts, idx = _fast_path_scene(eps)
    q = jnp.asarray(np.random.default_rng(17).uniform(-5, 5, (n, 2)),
                    jnp.float32)
    active = jnp.arange(n) % 7 != 0
    state = init_walk_state(q, active)

    assert fast_dirichlet_available(scene_fast, eps) is False  # no env flag
    os.environ["ELAINA_PALLAS_INTERPRET"] = "1"
    try:
        assert fast_dirichlet_available(scene_fast, eps)
        # eps mismatch must disable the fast path (baked need bits)
        assert not fast_dirichlet_available(scene_fast, eps * 0.9)
        in_f, RB_f, col_f, RD_f = _separate(scene_fast, state, eps, 32,
                                            shrink=True)
    finally:
        os.environ["ELAINA_PALLAS_INTERPRET"] = "0"
    in_r, RB_r, col_r, RD_r = _separate(scene_ref, state, eps, 32,
                                        shrink=True)

    a, b = verts[idx[:, 0]][None], verts[idx[:, 1]][None]
    d_true = np.asarray(jnp.min(
        seg_closest_point(np.asarray(q)[:, None, :], a, b)[0], axis=1))

    in_f, in_r = np.asarray(in_f), np.asarray(in_r)
    RD_f = np.asarray(RD_f)
    act = np.asarray(active)

    # identical in-shell classification (modulo exact boundary ties)
    np.testing.assert_array_equal(in_f & act, in_r & act)
    # in-shell lanes carry the exact distance
    np.testing.assert_allclose(RD_f[in_f & act], d_true[in_f & act],
                               rtol=1e-5, atol=1e-5)
    # everywhere active: a valid lower bound that keeps the walk correct
    assert np.all(RD_f[act] <= d_true[act] + 1e-4)
    # no active lane inside the true shell may be missed
    assert np.all(~(act & (d_true < eps * 0.999) & in_r) | in_f)
    # colors agree on in-shell lanes
    np.testing.assert_allclose(np.asarray(col_f)[in_f & act],
                               np.asarray(col_r)[in_f & act],
                               rtol=1e-5, atol=1e-5)
    # star radii agree on in-shell-free active lanes up to bound slack:
    # fast-path R_B is a valid (possibly smaller) radius
    RB_f, RB_r = np.asarray(RB_f), np.asarray(RB_r)
    assert np.all(RB_f[act] <= RB_r[act] + 1e-4)


def test_grid_pallas_dma_path_3d_interpret():
    """The 3D Pallas per-lane-DMA band sweep (interpret mode) matches brute
    force, and the winner coordinates match the winning triangle's verts."""
    rng = np.random.default_rng(21)
    centers = rng.uniform(-3, 3, (150, 3)).astype(np.float32)
    offs = rng.uniform(-0.5, 0.5, (150, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(450, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -4, np.float32)
    hi = np.full(3, 4, np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=64, max_res=32)

    from elaina_tpu.geometry.grid import attach_coords, grid_row_index
    from elaina_tpu.ops.pallas_queries import grid_band_dma_3d

    grid_c = attach_coords(grid, verts, idx)
    assert grid_c.coords.shape[1] % 8 == 0 and grid_c.coords.shape[2] == 128

    q = jnp.asarray(rng.uniform(-4, 4, (600, 3)), jnp.float32)
    row = grid_row_index(grid_c, q)
    K = grid_c.cand.shape[1]
    d2, slot, c9 = grid_band_dma_3d(row, q, grid_c.coords, -(-K // 128),
                                    interpret=True)
    pid = np.asarray(grid_c.cand[row, jnp.minimum(slot, K - 1)])

    # winner coordinates are the winning triangle's actual vertices
    for k in range(3):
        for d in range(3):
            np.testing.assert_allclose(np.asarray(c9[3 * k + d]),
                                       verts[idx[pid, k], d], rtol=0, atol=0)

    a = verts[idx[:, 0]][None]
    b = verts[idx[:, 1]][None]
    c = verts[idx[:, 2]][None]
    db, _ = tri_closest_point(np.asarray(q)[:, None, :], a, b, c)
    db = np.asarray(jnp.min(db, axis=1))
    if float(grid.coverage) == 1.0:
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)), db,
                                   rtol=1e-4, atol=1e-5)
    else:
        assert float(np.mean(np.abs(np.sqrt(np.asarray(d2)) - db) < 1e-4)) > 0.99

    # masked lanes (row < 0) must be skipped without corrupting others
    mask = jnp.asarray(np.arange(600) % 3 == 0)
    row_m = jnp.where(mask, row, -1)
    d2_m, _, _ = grid_band_dma_3d(row_m, q, grid_c.coords, -(-K // 128),
                                  interpret=True)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(d2_m)[m], np.asarray(d2)[m],
                               rtol=0, atol=0)


def test_masked_dirichlet_distance_3d():
    """dirichlet_distance_masked on the 3D interpret Pallas path: exact
    where need, valid lower bound elsewhere."""
    import os

    rng = np.random.default_rng(23)
    centers = rng.uniform(-3, 3, (150, 3)).astype(np.float32)
    offs = rng.uniform(-0.5, 0.5, (150, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(450, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -4, np.float32)
    hi = np.full(3, 4, np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=64, max_res=32)
    if float(grid.coverage) != 1.0:
        import pytest
        pytest.skip("band did not fit K; exactness not guaranteed")

    from elaina_tpu.core.problem import Boundary, Scene
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.geometry.grid import attach_coords
    from elaina_tpu.solver.wost import dirichlet_distance_masked

    gs, _ = make_geom_set(verts, idx)
    scene = Scene(
        dirichlet=Boundary(gs=gs, colors=jnp.zeros((450, 2, 3))),
        neumann=None, d_grid=attach_coords(grid, verts, idx), source=None,
        aabb_lo=lo, aabb_hi=hi, dim=3, source_intensity=1.0,
        dirichlet_intensity=1.0, neumann_intensity=1.0)

    q = jnp.asarray(rng.uniform(-4, 4, (800, 3)), jnp.float32)
    active = jnp.arange(800) % 5 != 0
    eps = 0.3
    os.environ["ELAINA_PALLAS_INTERPRET"] = "1"
    try:
        d, pid, pv, need = dirichlet_distance_masked(scene, q, active, eps, 32)
    finally:
        os.environ["ELAINA_PALLAS_INTERPRET"] = "0"

    a = verts[idx[:, 0]][None]
    b = verts[idx[:, 1]][None]
    c = verts[idx[:, 2]][None]
    d_true, _ = tri_closest_point(np.asarray(q)[:, None, :], a, b, c)
    d_true = np.asarray(jnp.min(d_true, axis=1))
    d = np.asarray(d)
    need = np.asarray(need)
    act = np.asarray(active)
    np.testing.assert_allclose(d[need], d_true[need], rtol=1e-4, atol=1e-5)
    skip = act & ~need
    assert np.all(d[skip] <= d_true[skip] + 1e-5)
    assert np.all(d[skip] >= eps)
    assert np.all(~(act & (d_true < eps)) | need)


def test_fine_pack_3d_matches_meta_chain():
    """3D FinePack: dense finest-level rows match the meta descent and the
    baked need bit is conservative (exercises the 2^dim gather expansion,
    the 3-axis interleave, and the deep-level scatter)."""
    rng = np.random.default_rng(31)
    # clustered triangles force refinement at small K
    centers = rng.uniform(-2, 2, (80, 3)).astype(np.float32)
    offs = rng.uniform(-0.3, 0.3, (80, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(240, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -3, np.float32)
    hi = np.full(3, 3, np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=16, max_res=16,
                                max_levels=4)
    assert len(grid.meta) >= 2   # must exercise at least one expansion

    from elaina_tpu.geometry.grid import (attach_fine, fine_decode,
                                          grid_row_index)

    eps = 0.25
    grid_f = attach_fine(grid, eps)
    assert grid_f.fine is not None
    assert grid_f.fine.res == tuple(
        rr << (len(grid.meta) - 1) for rr in grid.res)

    q = jnp.asarray(rng.uniform(-2.99, 2.99, (3000, 3)), jnp.float32)
    row_ref = np.asarray(grid_row_index(grid, q))
    row_f, need_f, rl_f, outside = (np.asarray(a)
                                    for a in fine_decode(grid_f.fine, q))
    assert not outside.any()
    np.testing.assert_array_equal(row_f, row_ref)
    np.testing.assert_array_equal(need_f, rl_f < eps)

    # the decoded bound stays a valid lower bound of the true distance
    a = verts[idx[:, 0]][None]
    b = verts[idx[:, 1]][None]
    c = verts[idx[:, 2]][None]
    d_true, _ = tri_closest_point(np.asarray(q)[:, None, :], a, b, c)
    d_true = np.asarray(jnp.min(d_true, axis=1))
    assert np.all(rl_f <= d_true + 1e-5)
    # no point in the true shell may be missed
    assert np.all(~(d_true < eps) | need_f)


def _fast_path_scene_3d(eps, K=64, colors_seed=13):
    """Triangle-soup 3D scene with ALL fast-path attachments (fine pack,
    coordinate planes, candidate-id tiles, 3-corner color rows)."""
    from elaina_tpu.core.problem import Boundary, Scene
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.geometry.grid import (attach_coords, attach_fine,
                                          attach_shading)

    rng = np.random.default_rng(23)
    centers = rng.uniform(-3, 3, (120, 3)).astype(np.float32)
    offs = rng.uniform(-0.6, 0.6, (120, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(360, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -4.5, np.float32)
    hi = np.full(3, 4.5, np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=K, max_res=32)
    colors = np.asarray(
        np.random.default_rng(colors_seed).uniform(0, 1, (len(verts), 2, 3)),
        np.float32)

    g_fast = attach_shading(attach_fine(attach_coords(grid, verts, idx), eps),
                            colors, idx)
    assert (g_fast.fine is not None and g_fast.cpack is not None
            and g_fast.crows is not None)

    def scene_of(g):
        return Scene(
            dirichlet=Boundary(gs=make_geom_set(verts, idx)[0],
                               colors=jnp.asarray(colors)),
            neumann=None, d_grid=g, source=None,
            aabb_lo=jnp.asarray(lo), aabb_hi=jnp.asarray(hi), dim=3,
            source_intensity=1.0, dirichlet_intensity=1.0,
            neumann_intensity=1.0)

    return scene_of(g_fast), scene_of(grid), verts, idx


@pytest.mark.parametrize("n", [1024, 4096])
def test_fused_resolve_3d_matches_chain_path(n):
    """The 3D bitmask resolve (sweep_resolve_3d + fetch_colors3, interpret
    mode) agrees with the chain path: in-shell classification, exact R_D on
    resolved lanes, valid bounds elsewhere, interpolated triangle colors.
    n=1024 drives the direct sweep, n=4096 the lane-compacted path
    (VERDICT r2 next #4: lift the 2D-only fast-path gate)."""
    import os

    from elaina_tpu.solver.wost import (_separate, fast_dirichlet_available,
                                        init_walk_state)

    eps = 0.3
    scene_fast, scene_ref, verts, idx = _fast_path_scene_3d(eps)
    q = jnp.asarray(np.random.default_rng(29).uniform(-4.5, 4.5, (n, 3)),
                    jnp.float32)
    active = jnp.arange(n) % 5 != 0
    state = init_walk_state(q, active)

    os.environ["ELAINA_PALLAS_INTERPRET"] = "1"
    try:
        assert fast_dirichlet_available(scene_fast, eps)
        in_f, RB_f, col_f, RD_f = _separate(scene_fast, state, eps, 32,
                                            shrink=True)
    finally:
        os.environ["ELAINA_PALLAS_INTERPRET"] = "0"
    in_r, RB_r, col_r, RD_r = _separate(scene_ref, state, eps, 32,
                                        shrink=True)

    a = verts[idx[:, 0]][None]
    b = verts[idx[:, 1]][None]
    c = verts[idx[:, 2]][None]
    d_true = np.asarray(jnp.min(
        tri_closest_point(np.asarray(q)[:, None, :], a, b, c)[0], axis=1))

    in_f, in_r = np.asarray(in_f), np.asarray(in_r)
    RD_f = np.asarray(RD_f)
    act = np.asarray(active)

    np.testing.assert_array_equal(in_f & act, in_r & act)
    np.testing.assert_allclose(RD_f[in_f & act], d_true[in_f & act],
                               rtol=1e-4, atol=1e-4)
    assert np.all(RD_f[act] <= d_true[act] + 1e-4)
    assert np.all(~(act & (d_true < eps * 0.999) & in_r) | in_f)
    assert (in_f & act).sum() > 0          # the test exercises in-shell lanes
    np.testing.assert_allclose(np.asarray(col_f)[in_f & act],
                               np.asarray(col_r)[in_f & act],
                               rtol=1e-4, atol=1e-4)
    RB_f, RB_r = np.asarray(RB_f), np.asarray(RB_r)
    assert np.all(RB_f[act] <= RB_r[act] + 1e-4)


def test_truncated_row_resolve_keeps_lower_bound():
    """Last-level over-K cells keep nearest-K TRUNCATED rows whose sweep
    min can OVERESTIMATE the true distance; the fast path must fall back
    to the cell lower bound there so star-ball emptiness holds (ADVICE r3
    #1 / grid._trunc_fallback parity).  Forces truncation with a dense
    segment cluster, K=8 and max_levels=1 (level 0 is the last level)."""
    import os

    from elaina_tpu.core.problem import Boundary, Scene
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.geometry.grid import (attach_coords, attach_fine,
                                          attach_shading)
    from elaina_tpu.solver.wost import (_separate, fast_dirichlet_available,
                                        init_walk_state)

    rng = np.random.default_rng(47)
    n_seg = 600
    centers = rng.uniform(-2, 2, (n_seg, 2)).astype(np.float32)
    offs = rng.uniform(-0.15, 0.15, (n_seg, 2, 2)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 2)
    idx = np.arange(2 * n_seg, dtype=np.int32).reshape(-1, 2)
    lo = np.full(2, -3, np.float32)
    hi = np.full(2, 3, np.float32)
    eps = 0.3

    grid = build_candidate_grid(verts, idx, lo, hi, K=8, max_res=8,
                                max_levels=1)
    assert bool(np.asarray(grid.row_trunc).any())   # truncation engaged
    assert np.isfinite(grid.trunc_min_rl)
    assert grid.trunc_min_rl < 2.0 * eps            # clamp compiles in

    colors = np.asarray(rng.uniform(0, 1, (2 * n_seg, 2, 3)), np.float32)
    g_fast = attach_shading(attach_fine(attach_coords(grid, verts, idx), eps),
                            colors, idx)
    scene = Scene(
        dirichlet=Boundary(gs=make_geom_set(verts, idx)[0],
                           colors=jnp.asarray(colors)),
        neumann=None, d_grid=g_fast, source=None,
        aabb_lo=lo, aabb_hi=hi, dim=2, source_intensity=1.0,
        dirichlet_intensity=1.0, neumann_intensity=1.0)

    q = jnp.asarray(rng.uniform(-2.9, 2.9, (2048, 2)), jnp.float32)
    active = jnp.ones((2048,), bool)
    state = init_walk_state(q, active)

    os.environ["ELAINA_PALLAS_INTERPRET"] = "1"
    try:
        assert fast_dirichlet_available(scene, eps)
        in_f, RB_f, col_f, RD_f = _separate(scene, state, eps, 32,
                                            shrink=True)
    finally:
        os.environ["ELAINA_PALLAS_INTERPRET"] = "0"

    a, b = verts[idx[:, 0]][None], verts[idx[:, 1]][None]
    d_true = np.asarray(jnp.min(
        seg_closest_point(np.asarray(q)[:, None, :], a, b)[0], axis=1))

    in_f = np.asarray(in_f)
    RD_f = np.asarray(RD_f)
    # star-ball emptiness: every non-terminating lane's radius is a valid
    # lower bound of the true boundary distance (pre-fix, truncated rows
    # returned the possibly-larger min-over-K here)
    free = ~in_f
    assert np.all(RD_f[free] <= d_true[free] + 1e-4)
    assert np.all(np.asarray(RB_f)[free] <= d_true[free] + 1e-4)
    # in-shell lanes really are within eps of SOME boundary (the sweep's
    # d_e < eps is stricter than the generic path's rl < eps gate)
    assert np.all(d_true[in_f] < eps + 1e-4)
