#!/usr/bin/env python
"""Per-stage TPU timing of the WoSt depth step with FORCED host syncs
(np.asarray of a small reduction) — block_until_ready on the tunneled axon
backend has been observed returning instantly, so all timings here round-trip
a scalar.

Usage: python tools/tpu_profile_stages.py [--res 256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np


def timed(label, compiled, *args, reps=2):
    # warmup + sync
    out = compiled(*args)
    s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = compiled(*args)
        s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    print(f"{label:40s} {min(ts)*1e3:10.1f} ms  (sync val {s:.4g})", flush=True)
    return min(ts)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}", flush=True)
    sys.path.insert(0, "/root/repo")
    from bench import _build_ladybug_problem
    from elaina_tpu.geometry import queries as Q
    from elaina_tpu.geometry.grid import grid_closest_point
    from elaina_tpu.solver.wost import (init_walk_state, run_one_sample,
                                        wost_depth_step)

    t0 = time.time()
    problem = _build_ladybug_problem(args.res, "grid")
    print(f"problem built in {time.time()-t0:.1f}s", flush=True)
    scene = problem.scene
    n = args.res * args.res
    pts = problem.probe.points(jnp.arange(n), (args.res, args.res))
    mask = jnp.ones((n,), bool)
    key = jax.random.PRNGKey(0)

    dgs = scene.dirichlet.gs
    ngs = scene.neumann.gs

    # --- stage: grid closest point (the Dirichlet query) ---
    f = jax.jit(lambda g, v, i, q: jnp.sum(grid_closest_point(g, v, i, q)[0]))
    c = f.lower(scene.d_grid, dgs.verts, dgs.indices, pts).compile()
    timed("grid_closest_point x1", c, scene.d_grid, dgs.verts, dgs.indices, pts)

    # --- grid closest point inside a 4-scan ---
    def scan4(g, v, i, q):
        def body(acc, _):
            d, pid = grid_closest_point(g, v, i, q + acc * 1e-6)
            return acc + jnp.sum(d), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=4)
        return out
    c = jax.jit(scan4).lower(scene.d_grid, dgs.verts, dgs.indices, pts).compile()
    timed("grid_closest_point scan x4", c, scene.d_grid, dgs.verts,
          dgs.indices, pts)

    # --- stage: closest silhouette (neumann, dense) ---
    c = jax.jit(lambda g, q: jnp.sum(
        jnp.where(jnp.isfinite(Q.closest_silhouette(g, q)),
                  Q.closest_silhouette(g, q), 0.0))).lower(ngs, pts).compile()
    timed("closest_silhouette x1", c, ngs, pts)

    # --- stage: ray intersect (neumann, dense) ---
    dirs = jax.random.normal(key, (n, 2))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 100.0)
    c = jax.jit(lambda g, o, d, t: jnp.sum(
        Q.ray_intersect(g, o, d, t)[1].clip(0, 1e3))).lower(
        ngs, pts, dirs, tmax).compile()
    timed("ray_intersect x1", c, ngs, pts, dirs, tmax)

    # --- stage: sample in ball (neumann) ---
    R = jnp.full((n,), 50.0)
    u = jax.random.uniform(key, (n,))
    c = jax.jit(lambda g, q, r, uu: jnp.sum(
        Q.sample_in_ball(g, q, r, uu)[1])).lower(ngs, pts, R, u).compile()
    timed("sample_in_ball x1", c, ngs, pts, R, u)

    # --- full depth step x1 ---
    def step1(sc, p, m, k):
        st = init_walk_state(p, m)
        st, contrib = wost_depth_step(sc, st, k, 1.0, problem.d_stack,
                                      problem.n_stack)
        return jnp.sum(contrib)
    c = jax.jit(step1).lower(scene, pts, mask, key).compile()
    timed("wost_depth_step x1", c, scene, pts, mask, key)

    # --- full step scan (run_one_sample) at several depths ---
    for depth in (4, 64):
        def fulln(sc, p, m, k, _d=depth):
            total, steps = run_one_sample(sc, p, m, k, eps=1.0, max_depth=_d,
                                          d_stack=problem.d_stack,
                                          n_stack=problem.n_stack)
            return jnp.sum(total) + steps

        c = jax.jit(fulln).lower(scene, pts, mask, key).compile()
        t = timed(f"run_one_sample depth={depth}", c, scene, pts, mask, key)
        # executed walk-steps/s at this depth
        steps = int(jax.jit(
            lambda sc, p, m, k, _d=depth: run_one_sample(
                sc, p, m, k, eps=1.0, max_depth=_d,
                d_stack=problem.d_stack, n_stack=problem.n_stack)[1]
        )(scene, pts, mask, key))
        print(f"  -> {steps} walk-steps, {steps / t:.3g} walk-steps/s",
              flush=True)


if __name__ == "__main__":
    main()
