#!/usr/bin/env python
"""Isolate the per-iteration cost of the neumann3d guide/walk step.

The r3d batch measured ~1 s per 65k-lane iteration on neumann3d (vs ~2 ms
on the 2D scenes) — long enough that a full-length dispatch trips the
tunneled TPU's runtime watchdog and crashes the worker.  This probe times
the step's component queries standalone on the real neumann3d tables:

  - grid_closest_silhouette (SilGrid row gather + dense K-sweep)
  - the Dirichlet distance path (fast bitmask resolve or chain)
  - green in-ball sampling on the source term's query pattern

Usage: python tools/tpu_sil_probe.py [--n 65536] [--scene neumann3d_u.json]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

from elaina_tpu.exec import _apply_platform_env

_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np

LEN = 32


def timed(label, fn, *args, reps=3):
    """Time fn under a LEN-iteration scan (amortizes dispatch overhead)."""
    def outer(q, *rest):
        def body(carry, i):
            out = fn(carry, *rest)
            # fold the output back into the carry so the scan can't be
            # collapsed into one iteration
            return carry + 1e-7 * jnp.mean(out), None
        c, _ = jax.lax.scan(body, q, jnp.arange(LEN))
        return c

    c = jax.jit(outer).lower(*args).compile()
    out = c(*args)
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = c(*args)
        np.asarray(out)
        ts.append(time.time() - t0)
    t = min(ts) / LEN
    n = args[0].shape[0]
    print(f"{label:44s} {t*1e3:9.3f} ms/iter  ({t/n*1e9:7.1f} ns/lane)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--scene", default="neumann3d_u.json")
    ap.add_argument("--eps", type=float, default=0.01,
                    help="epsilonShell; must match the scene config's for "
                         "the production fast path (FinePack eps gate)")
    a = ap.parse_args()

    from bench import _build_conf_problem
    import elaina_tpu.geometry.queries as Q

    problem = _build_conf_problem(a.scene, "grid")
    scene = problem.scene
    if scene.d_grid is not None and (
            scene.d_grid.fine is None
            or scene.d_grid.fine.eps != float(a.eps)):
        import dataclasses

        from elaina_tpu.geometry.grid import attach_fine
        scene = dataclasses.replace(
            scene, d_grid=attach_fine(scene.d_grid, float(a.eps)))
        problem.scene = scene
    dim = scene.dim
    print(f"scene={a.scene} dim={dim} devices={jax.devices()}", flush=True)
    if scene.neumann is not None:
        print(f"neumann prims={scene.neumann.gs.indices.shape[0]} "
              f"sil entities={scene.neumann.gs.sil_p0.shape[0]} "
              f"sil grid={'yes' if scene.n_sgrid is not None else 'NO'}",
              flush=True)

    lo = np.asarray(scene.aabb_lo)
    hi = np.asarray(scene.aabb_hi)
    rng = np.random.default_rng(7)
    q = jnp.asarray(
        lo + (hi - lo) * rng.random((a.n, dim)), jnp.float32)

    # NOTE: scene tables are passed as ARGUMENTS, never closure captures —
    # captured arrays are embedded as constants in the lowered module and
    # the remote-compile request body (the 906 MB SilGrid coords table
    # produced an HTTP 413 / multi-minute compile uploads, r3f probe)
    if scene.n_sgrid is not None:
        timed("grid_closest_silhouette",
              lambda qq, sg, gs: Q.grid_closest_silhouette(sg, gs, qq),
              q, scene.n_sgrid, scene.neumann.gs)
    if scene.neumann is not None and os.environ.get("ELAINA_PROBE_DENSE"):
        # opt-in: the 30720-entity dense sweep CRASHES the TPU worker
        # (kernel fault, r3e probe) — a latent bug of its own; keep it
        # out of the default probe so one run can't kill the batch
        timed("dense closest_silhouette",
              lambda qq, gs: Q.closest_silhouette(gs, qq),
              q, scene.neumann.gs)

    from elaina_tpu.solver.wost import (WalkState, _fast_dirichlet,
                                        _separate, dirichlet_distance_masked,
                                        fast_dirichlet_available)

    st = init_state = WalkState(
        pos=q, thp=jnp.ones((a.n,)), active=jnp.ones((a.n,), bool),
        on_neumann=jnp.zeros((a.n,), bool),
        n_normal=jnp.zeros((a.n, dim), jnp.float32))
    eps = float(a.eps)
    print(f"eps={eps} fast_dirichlet="
          f"{fast_dirichlet_available(scene, eps)}", flush=True)

    def sep_rb(qq, sc):
        _, R_B, _, _ = _separate(sc, st._replace(pos=qq), eps, 48, True)
        return R_B

    timed("_separate (R_D + R_N + shell)", sep_rb, q, scene)

    use_fast = scene.dirichlet is not None and fast_dirichlet_available(
        scene, eps)

    def dirichlet_only(qq, sc):
        if use_fast:
            R_D, _, _, _ = _fast_dirichlet(sc, qq, st.active, eps)
            return R_D
        R_D, _, _, _ = dirichlet_distance_masked(sc, qq, st.active, eps, 48)
        return R_D

    timed("dirichlet distance path", dirichlet_only, q, scene)

    # ---- prim-band queries (the per-step Neumann workload) ----
    if scene.n_bgrid is not None:
        import elaina_tpu.solver.wost as W

        bg = scene.n_bgrid
        gs = scene.neumann.gs
        key = jax.random.PRNGKey(3)
        R = jnp.full((a.n,), 0.05, jnp.float32)
        u1 = jax.random.uniform(key, (a.n,))
        d_ray = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                                1e-9)

        timed("band_r_cap", lambda qq, b: Q.band_r_cap(b, qq), q, bg)
        timed("band_ray_intersect",
              lambda qq, b, g: Q.band_ray_intersect(
                  b, g, qq, d_ray, R, ref=qq)[1], q, bg, gs)
        timed("band_sample_in_ball",
              lambda qq, b, g: Q.band_sample_in_ball(b, g, qq, R, u1)[1],
              q, bg, gs)

        def neumann_full(qq, sc):
            stl = st._replace(pos=qq)
            live = jnp.ones((a.n,), bool)
            c = W._neumann_term(sc, stl, live, R, key, eps, 48)
            return jnp.sum(c, axis=-1)

        timed("_neumann_term (ball+vis ray)", neumann_full, q, scene)

        def step_full(qq, sc):
            stl = st._replace(pos=qq)
            st2, c = W.wost_depth_step(sc, stl, key, eps, 48, 48)
            return jnp.sum(c, axis=-1) + st2.thp

        # the ELAINA_FUSED_BAND gate is read at TRACE time, so set it
        # around each lowering to time both step variants
        os.environ["ELAINA_FUSED_BAND"] = "0"
        timed("wost_depth_step (uniform, unfused)", step_full, q, scene)
        os.environ["ELAINA_FUSED_BAND"] = "1"
        timed("wost_depth_step (uniform, FUSED)", step_full, q, scene)
        del os.environ["ELAINA_FUSED_BAND"]


if __name__ == "__main__":
    main()
