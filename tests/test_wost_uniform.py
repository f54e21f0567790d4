"""End-to-end uniform WoSt tests against analytic harmonic solutions
(test strategy per SURVEY.md §4 "Implications for the TPU build")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.core.problem import Boundary, Scene
from elaina_tpu.geometry.geomset import make_geom_set
from elaina_tpu.solver.wost import run_one_sample


def _square_boundary(n_per_side=8, half=1.0, sides=(0, 1, 2, 3)):
    """CCW square boundary [-half, half]^2; returns (verts, indices).

    sides: 0=bottom, 1=right, 2=top, 3=left (only those are emitted).
    """
    corners = np.array([[-half, -half], [half, -half], [half, half], [-half, half]],
                       np.float32)
    verts, indices = [], []
    for s in sides:
        a, b = corners[s], corners[(s + 1) % 4]
        base = len(verts)
        pts = a[None] + np.linspace(0, 1, n_per_side + 1)[:, None] * (b - a)[None]
        verts.extend(pts)
        indices.extend([(base + i, base + i + 1) for i in range(n_per_side)])
    return np.asarray(verts, np.float32), np.asarray(indices, np.int32)


def _colors_from_fn(verts, fn):
    vals = np.asarray([fn(v) for v in verts], np.float32)
    colors = np.zeros((len(verts), 2, 3), np.float32)
    colors[:, 0, :] = vals[:, None]
    colors[:, 1, :] = vals[:, None]
    return colors


def _scene(dirichlet=None, neumann=None):
    return Scene(
        dirichlet=dirichlet, neumann=neumann, d_grid=None, source=None,
        aabb_lo=jnp.asarray([-1.0, -1.0]), aabb_hi=jnp.asarray([1.0, 1.0]),
        dim=2, source_intensity=1.0, dirichlet_intensity=1.0,
        neumann_intensity=1.0,
    )


def _solve(scene, pts, spp=128, max_depth=48, eps=0.02, seed=0):
    pts = jnp.asarray(pts, jnp.float32)
    mask = jnp.ones((pts.shape[0],), bool)
    key = jax.random.PRNGKey(seed)

    step = jax.jit(lambda k: run_one_sample(
        scene, pts, mask, k, eps=eps, max_depth=max_depth))
    total = jnp.zeros((pts.shape[0], 3))
    for s in range(spp):
        contrib, _steps = step(jax.random.fold_in(key, s))
        total = total + contrib
    return np.asarray(total / spp)


def test_dirichlet_square_linear():
    """u = (x+1)/2 is harmonic; pure Dirichlet square must reproduce it."""
    verts, indices = _square_boundary(n_per_side=8)
    gs, _ = make_geom_set(verts, indices)
    colors = _colors_from_fn(verts, lambda v: (v[0] + 1.0) / 2.0)
    scene = _scene(dirichlet=Boundary(gs=gs, colors=jnp.asarray(colors)))

    pts = np.array([[0.0, 0.0], [0.5, 0.3], [-0.6, -0.2], [0.2, -0.7]], np.float32)
    u = _solve(scene, pts, spp=192)
    expected = (pts[:, 0] + 1.0) / 2.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.05)
    # all three channels identical
    np.testing.assert_allclose(u[:, 0], u[:, 1], atol=1e-6)


def test_dirichlet_square_constant():
    """Constant boundary data -> constant solution (zero-variance sanity)."""
    verts, indices = _square_boundary(n_per_side=4)
    gs, _ = make_geom_set(verts, indices)
    colors = _colors_from_fn(verts, lambda v: 0.75)
    scene = _scene(dirichlet=Boundary(gs=gs, colors=jnp.asarray(colors)))
    pts = np.array([[0.1, 0.2], [-0.4, 0.6]], np.float32)
    u = _solve(scene, pts, spp=64)
    np.testing.assert_allclose(u[:, 0], 0.75, atol=0.02)


def test_mixed_dirichlet_neumann_linear():
    """Left wall u=0, right wall u=1 (Dirichlet); top/bottom reflecting
    (zero Neumann).  Solution u = (x+1)/2 — exercises silhouettes, ray
    clipping, and on-boundary hemisphere walks."""
    d_verts, d_indices = _square_boundary(n_per_side=6, sides=(1, 3))
    d_gs, _ = make_geom_set(d_verts, d_indices)
    d_colors = _colors_from_fn(d_verts, lambda v: (v[0] + 1.0) / 2.0)

    n_verts, n_indices = _square_boundary(n_per_side=6, sides=(0, 2))
    n_gs, _ = make_geom_set(n_verts, n_indices)
    n_colors = _colors_from_fn(n_verts, lambda v: 0.0)

    scene = _scene(
        dirichlet=Boundary(gs=d_gs, colors=jnp.asarray(d_colors)),
        neumann=Boundary(gs=n_gs, colors=jnp.asarray(n_colors)),
    )
    pts = np.array([[0.0, 0.0], [0.5, 0.8], [-0.5, -0.8]], np.float32)
    u = _solve(scene, pts, spp=256, max_depth=64)
    expected = (pts[:, 0] + 1.0) / 2.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.07)


def test_persistent_lanes_match_analytic():
    """The persistent-lane solve (lanes restart samples back-to-back) is
    the same estimator as the per-sample sweep: validate against the mixed
    Dirichlet/Neumann analytic solution."""
    from elaina_tpu.solver.wost import (compute_step0, make_persistent_chunk,
                                        persistent_carry_from_step0)

    d_verts, d_indices = _square_boundary(n_per_side=6, sides=(1, 3))
    d_gs, _ = make_geom_set(d_verts, d_indices)
    d_colors = _colors_from_fn(d_verts, lambda v: (v[0] + 1.0) / 2.0)
    n_verts, n_indices = _square_boundary(n_per_side=6, sides=(0, 2))
    n_gs, _ = make_geom_set(n_verts, n_indices)
    scene = _scene(
        dirichlet=Boundary(gs=d_gs, colors=jnp.asarray(d_colors)),
        neumann=Boundary(gs=n_gs, colors=jnp.zeros((len(n_verts), 2, 3))),
    )
    pts = jnp.asarray([[0.0, 0.0], [0.5, 0.8], [-0.5, -0.8]], jnp.float32)
    mask = jnp.ones((3,), bool)
    spp = 256
    rd0, in_shell0, contrib0 = compute_step0(scene, pts, mask, eps=0.02)
    assert not bool(jnp.any(in_shell0))
    chunk = make_persistent_chunk(eps=0.02, max_depth=64, spp=spp,
                                  iter_chunk=128)
    carry = persistent_carry_from_step0(pts, mask, spp, in_shell0, contrib0)
    key = jax.random.PRNGKey(7)
    total_steps = 0
    for _ in range(200):
        carry, remaining, steps = chunk(scene, pts, mask, rd0, key, carry)
        total_steps += int(steps)
        if not bool(remaining):
            break
    assert not bool(remaining)
    # every lane ran exactly spp samples
    np.testing.assert_array_equal(np.asarray(carry[2]), spp)
    u = np.asarray(carry[1]) / spp
    expected = (np.asarray(pts)[:, 0] + 1.0) / 2.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.07)
    assert total_steps > spp * 3  # counted real executed steps


def test_balanced_solve_matches_analytic():
    """The cost-balanced worklist solve (warmup + repartitioned rounds,
    wost.balanced_solve) delivers exactly spp samples per pixel and matches
    the analytic solution."""
    from elaina_tpu.solver.wost import (balanced_solve,
                                        build_balanced_pieces, compute_step0)

    # piece construction invariants on a synthetic remainder
    rng = np.random.default_rng(11)
    rem = rng.integers(0, 33, 200).astype(np.int64)
    cost = rng.uniform(1, 20, 200)
    pix, quota = build_balanced_pieces(rem, cost, n_lanes=64, s=4)
    assigned = np.zeros(200, np.int64)
    np.add.at(assigned, pix.reshape(-1), quota.reshape(-1))
    assert np.all(assigned <= rem)            # never over-assign
    assert assigned.sum() >= 0.8 * rem.sum()  # dropped pieces are rare
    # per-lane cost balance within a reasonable factor
    lane_cost = (quota * cost[pix]).sum(0)
    target = (rem * cost).sum() / 64
    assert lane_cost.max() <= 3.5 * target + cost.max() * 33

    d_verts, d_indices = _square_boundary(n_per_side=6, sides=(1, 3))
    d_gs, _ = make_geom_set(d_verts, d_indices)
    d_colors = _colors_from_fn(d_verts, lambda v: (v[0] + 1.0) / 2.0)
    n_verts, n_indices = _square_boundary(n_per_side=6, sides=(0, 2))
    n_gs, _ = make_geom_set(n_verts, n_indices)
    scene = _scene(
        dirichlet=Boundary(gs=d_gs, colors=jnp.asarray(d_colors)),
        neumann=Boundary(gs=n_gs, colors=jnp.zeros((len(n_verts), 2, 3))),
    )
    pts = jnp.asarray([[0.0, 0.0], [0.5, 0.8], [-0.5, -0.8],
                       [0.2, -0.1], [-0.7, 0.3], [0.9, 0.0]], jnp.float32)
    n = pts.shape[0]
    mask = jnp.ones((n,), bool)
    spp = 256
    rd0, in_shell0, contrib0 = compute_step0(scene, pts, mask, eps=0.02)
    image, steps = balanced_solve(
        scene, None, np.asarray(pts), np.asarray(rd0),
        np.asarray(in_shell0 | ~mask), contrib0, in_shell0,
        spp=spp, eps=0.02, max_depth=64)
    u = np.asarray(image) / spp
    expected = (np.asarray(pts)[:, 0] + 1.0) / 2.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.07)
    assert steps > spp * n


def test_balanced_solve_lane_oversubscription(monkeypatch):
    """Small pixel grids widen to ELAINA_LANE_TARGET lanes (pixels split
    across co-lanes with independent per-lane RNG streams): the solve
    still delivers full spp per pixel, matches the analytic solution, and
    the width helper respects the target/sample/mesh bounds."""
    from elaina_tpu.solver.wost import (balanced_solve, compute_step0,
                                        oversub_lanes)

    monkeypatch.setenv("ELAINA_LANE_TARGET", str(64 * 1024))
    assert oversub_lanes(16384, 8, 1) == 64 * 1024     # 3D slice scenes
    assert oversub_lanes(16384, 2, 1) == 32768         # sample-bounded
    assert oversub_lanes(16384, 8, 8) == 64 * 1024     # mesh multiple holds
    assert oversub_lanes(262144, 64, 1) == 262144      # at/over target: keep
    assert oversub_lanes(6, 1, 1) == 6                 # spp 1: no widening

    d_verts, d_indices = _square_boundary(n_per_side=6, sides=(1, 3))
    d_gs, _ = make_geom_set(d_verts, d_indices)
    d_colors = _colors_from_fn(d_verts, lambda v: (v[0] + 1.0) / 2.0)
    scene = _scene(dirichlet=Boundary(gs=d_gs, colors=jnp.asarray(d_colors)))
    pts = jnp.asarray([[0.0, 0.0], [0.5, 0.8], [-0.5, -0.8],
                       [0.2, -0.1], [-0.7, 0.3], [0.9, 0.0]], jnp.float32)
    n = pts.shape[0]
    mask = jnp.ones((n,), bool)
    spp = 256
    rd0, in_shell0, contrib0 = compute_step0(scene, pts, mask, eps=0.02)

    # force heavy oversubscription: 6 pixels x 256 spp -> 512 lanes
    # (~85 co-lanes per pixel, quotas split by the balanced partition)
    monkeypatch.setenv("ELAINA_LANE_TARGET", "512")
    image, steps = balanced_solve(
        scene, None, np.asarray(pts), np.asarray(rd0),
        np.asarray(in_shell0 | ~mask), contrib0, in_shell0,
        spp=spp, eps=0.02, max_depth=64)
    u = np.asarray(image) / spp
    expected = (np.asarray(pts)[:, 0] + 1.0) / 2.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.07)
    assert steps > spp * n


def test_balanced_solve_time_budget_slicing():
    """Budget mode time-slices round quotas: with a generous budget the
    solve still delivers full spp and matches the analytic solution; with
    a tight budget it degrades to a uniform lower effective spp (rescaled
    partial sums stay near the analytic solution, just noisier)."""
    from elaina_tpu.solver.wost import balanced_solve, compute_step0

    d_verts, d_indices = _square_boundary(n_per_side=6, sides=(1, 3))
    d_gs, _ = make_geom_set(d_verts, d_indices)
    d_colors = _colors_from_fn(d_verts, lambda v: (v[0] + 1.0) / 2.0)
    n_verts, n_indices = _square_boundary(n_per_side=6, sides=(0, 2))
    n_gs, _ = make_geom_set(n_verts, n_indices)
    scene = _scene(
        dirichlet=Boundary(gs=d_gs, colors=jnp.asarray(d_colors)),
        neumann=Boundary(gs=n_gs, colors=jnp.zeros((len(n_verts), 2, 3))),
    )
    pts = jnp.asarray([[0.0, 0.0], [0.5, 0.8], [-0.5, -0.8],
                       [0.2, -0.1], [-0.7, 0.3], [0.9, 0.0]], jnp.float32)
    n = pts.shape[0]
    mask = jnp.ones((n,), bool)
    spp = 256
    expected = (np.asarray(pts)[:, 0] + 1.0) / 2.0
    rd0, in_shell0, contrib0 = compute_step0(scene, pts, mask, eps=0.02)

    # generous budget: slicing engages but every sample completes
    image, _ = balanced_solve(
        scene, None, np.asarray(pts), np.asarray(rd0),
        np.asarray(in_shell0 | ~mask), contrib0, in_shell0,
        spp=spp, eps=0.02, max_depth=64, time_budget_s=600.0)
    np.testing.assert_allclose(np.asarray(image)[:, 0] / spp, expected,
                               atol=0.07)

    # tight budget: interrupted, rescaled — unbiased but noisier
    image, _ = balanced_solve(
        scene, None, np.asarray(pts), np.asarray(rd0),
        np.asarray(in_shell0 | ~mask), contrib0, in_shell0,
        spp=spp, eps=0.02, max_depth=64, time_budget_s=0.5)
    np.testing.assert_allclose(np.asarray(image)[:, 0] / spp, expected,
                               atol=0.4)


def test_source_term_disk():
    """Poisson check: -Laplacian u = 1 on the unit disk, u=0 on the
    boundary -> u(r) = (1 - r^2) / 4 (2D)."""
    t = np.linspace(0, 2 * np.pi, 129)[:-1]
    verts = np.stack([np.cos(t), np.sin(t)], -1).astype(np.float32)
    indices = np.stack([np.arange(128), (np.arange(128) + 1) % 128], -1).astype(np.int32)
    gs, _ = make_geom_set(verts, indices)
    colors = np.zeros((128, 2, 3), np.float32)

    from elaina_tpu.core.problem import SourceGrid
    res = 64
    data = np.ones((res, res, 3), np.float32)
    source = SourceGrid(
        data=jnp.asarray(data),
        origin=jnp.asarray([-1.5, -1.5]),
        inv_voxel=jnp.asarray([res / 3.0, res / 3.0]),
    )
    scene = Scene(
        dirichlet=Boundary(gs=gs, colors=jnp.asarray(colors)),
        neumann=None, d_grid=None, source=source,
        aabb_lo=jnp.asarray([-1.0, -1.0]), aabb_hi=jnp.asarray([1.0, 1.0]),
        dim=2, source_intensity=1.0, dirichlet_intensity=1.0,
        neumann_intensity=1.0,
    )
    pts = np.array([[0.0, 0.0], [0.5, 0.0], [0.0, -0.8]], np.float32)
    u = _solve(scene, pts, spp=256, eps=0.01)
    r2 = np.sum(pts**2, axis=-1)
    expected = (1.0 - r2) / 4.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.03)


def test_uniform_integrator_time_budget():
    """UniformIntegrator.solve(time_budget_s=...): the budgeted persistent
    solve finishes near the budget and stays unbiased (rescaled partial
    sums estimate the same harmonic function)."""
    import time

    from bench import _build_square_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.integrator import UniformIntegrator

    problem = _build_square_problem(16, "grid")
    settings = IntegratorSettings(
        frameSize=(16, 16), samplesPerPixel=64, maxWalkingDepth=32,
        epsilonShell=1.0)

    integ = UniformIntegrator(problem, settings, "/tmp/test_uni_tb")
    integ.prepare()
    ms_full = integ.solve()
    ref = np.asarray(integ.films["SOLUTION"].pixels())

    integ2 = UniformIntegrator(problem, settings, "/tmp/test_uni_tb2")
    integ2.prepare()
    budget = max(0.3 * ms_full / 1e3, 0.2)
    t0 = time.time()
    integ2.solve(time_budget_s=budget)
    wall = time.time() - t0
    img = np.asarray(integ2.films["SOLUTION"].pixels())
    assert np.isfinite(img).all()
    # overshoot bounded: worst case is the last slice plus one dispatch
    assert wall < 2.5 * budget + 3.0
    # unbiased: means agree within MC noise at this scale
    assert abs(img.mean() - ref.mean()) < 0.1 * max(abs(ref.mean()), 1e-3)
