#!/usr/bin/env python
"""Bisect the neumann3d TPU kernel fault: run each first-time-on-TPU 3D
kernel in isolation (invoke one stage per process; a fault kills only
that process and names the culprit).

Stages:
  sweep3d   sweep_resolve_3d + fetch_colors3 on a synthetic triangle soup
  sil       sil_band_dma on a synthetic SilGrid coords table
  silreal   grid_closest_silhouette on the real neumann3d SilGrid
  fastpath  _fast_dirichlet 3D on the synthetic fast-path scene
  step      one guided_depth_step on the real neumann3d scene

Usage: python tools/tpu_3d_bisect.py <stage> [--n 8192]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np


def synth_scene_3d(eps=0.05, K=64):
    """Triangle-soup 3D scene with all fast-path attachments (mirrors
    tests/test_grid._fast_path_scene_3d)."""
    from elaina_tpu.core.problem import Boundary, Scene
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.geometry.grid import (attach_coords, attach_fine,
                                          attach_shading,
                                          build_candidate_grid)

    rng = np.random.default_rng(13)
    centers = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
    offs = rng.uniform(-0.4, 0.4, (200, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(600, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -4, np.float32)
    hi = np.full(3, 4, np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=K, max_res=32)
    colors = np.asarray(rng.uniform(0, 1, (600, 2, 3)), np.float32)
    g = attach_shading(attach_fine(attach_coords(grid, verts, idx), eps),
                       colors, idx)
    scene = Scene(
        dirichlet=Boundary(gs=make_geom_set(verts, idx)[0],
                           colors=jnp.asarray(colors)),
        neumann=None, d_grid=g, source=None, aabb_lo=lo, aabb_hi=hi,
        dim=3, source_intensity=1.0, dirichlet_intensity=1.0,
        neumann_intensity=1.0)
    return scene, verts, idx


def stage_sweep3d(n):
    from elaina_tpu.solver.wost import _fast_dirichlet, fast_dirichlet_available
    scene, _, _ = synth_scene_3d()
    eps = 0.05
    assert fast_dirichlet_available(scene, eps), "fast path gated off?"
    q = jnp.asarray(np.random.default_rng(3).uniform(-4, 4, (n, 3)),
                    jnp.float32)
    act = jnp.ones((n,), bool)
    RD, ins, col, need = jax.jit(
        lambda sc, q, a: _fast_dirichlet(sc, q, a, eps))(scene, q, act)
    print("sweep3d ok:", float(RD.min()), int(ins.sum()), int(need.sum()),
          float(col.max()))


def stage_sil(n):
    from elaina_tpu.geometry.grid import sil_coords_from_rows
    from elaina_tpu.ops.pallas_queries import sil_band_dma
    rng = np.random.default_rng(11)
    C, K, E = 4096, 64, 500
    p0 = rng.uniform(-2, 2, (E, 3)).astype(np.float32)
    p1 = (p0 + rng.uniform(-0.2, 0.2, (E, 3))).astype(np.float32)
    n1 = rng.normal(size=(E, 3)).astype(np.float32)
    n2 = rng.normal(size=(E, 3)).astype(np.float32)
    always = rng.uniform(size=E) < 0.1
    rows = rng.integers(-1, E, (C, K)).astype(np.int32)
    coords = jnp.asarray(sil_coords_from_rows(rows, p0, p1, n1, n2, always))
    print("coords", coords.shape)
    lin = jnp.asarray(rng.integers(-1, C, (n,)), jnp.int32)
    q = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    d2 = sil_band_dma(lin, q, coords, -(-K // 128), 3)
    print("sil ok:", float(jnp.where(jnp.isfinite(d2), d2, 0).max()),
          int(jnp.isfinite(d2).sum()))


def _neumann_problem(eps=0.01):
    import dataclasses
    import json

    from elaina_tpu.core.problem import Problem
    from elaina_tpu.geometry.grid import attach_fine
    p = Problem(3, verbose=False).load_config(
        json.load(open("/root/repo/configs/neumann3d_u.json"))["scene"],
        cache_dir="/root/repo/.cache", accel="grid")
    # mirror BaseIntegrator.__init__: bake the eps need bit so the
    # bitmask FAST path runs (the chain path's grid_band_dma_3d scratch
    # blows scoped VMEM at this K — see stage_fastpath findings)
    if p.scene.d_grid is not None and p.scene.d_grid.coords is not None:
        p.scene = dataclasses.replace(
            p.scene, d_grid=attach_fine(p.scene.d_grid, eps))
    return p


def stage_silreal(n):
    from elaina_tpu.geometry.queries import grid_closest_silhouette
    problem = _neumann_problem()
    scene = problem.scene
    assert scene.n_sgrid is not None, "no SilGrid on neumann3d?"
    sg = scene.n_sgrid
    print("silgrid res", sg.res, "rows", sg.rows.shape,
          "coords", None if sg.coords is None else sg.coords.shape)
    q = jnp.asarray(np.random.default_rng(5).uniform(-1.2, 1.2, (n, 3)),
                    jnp.float32)
    d = jax.jit(grid_closest_silhouette)(sg, scene.neumann.gs, q)
    print("silreal ok:", float(d.min()), float(jnp.where(
        jnp.isfinite(d), d, 0).max()))


def stage_fastpath(n):
    from elaina_tpu.solver.wost import _separate, init_walk_state
    problem = _neumann_problem()
    scene = problem.scene
    from elaina_tpu.solver.wost import fast_dirichlet_available
    eps = 0.01
    print("fast path:", fast_dirichlet_available(scene, eps),
          "K:", scene.d_grid.cand.shape[1])
    q = jnp.asarray(np.random.default_rng(5).uniform(-1.2, 1.2, (n, 3)),
                    jnp.float32)
    state = init_walk_state(q, jnp.ones((n,), bool))
    in_s, RB, col, RD = jax.jit(
        lambda sc, st: _separate(sc, st, eps, problem.d_stack, shrink=True)
    )(scene, state)
    print("fastpath ok:", int(in_s.sum()), float(RB.min()), float(RD.min()))


def stage_step(n):
    from elaina_tpu.solver.wost import init_walk_state, wost_depth_step
    problem = _neumann_problem()
    scene = problem.scene
    q = jnp.asarray(np.random.default_rng(5).uniform(-1.2, 1.2, (n, 3)),
                    jnp.float32)
    state = init_walk_state(q, jnp.ones((n,), bool))
    st, contrib = jax.jit(lambda sc, st: wost_depth_step(
        sc, st, jax.random.PRNGKey(0), 0.01, problem.d_stack,
        problem.n_stack))(scene, state)
    print("step ok:", int(st.active.sum()), float(contrib.max()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage")
    ap.add_argument("--n", type=int, default=8192)
    a = ap.parse_args()
    globals()[f"stage_{a.stage}"](a.n)


if __name__ == "__main__":
    raise SystemExit(main())
