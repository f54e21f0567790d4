#!/usr/bin/env python
"""Fine-grained bisect of the WoSt depth-step cost at 65k lanes.

All timings inside a 64-iteration scan (the ~25 ms tunnel dispatch floor
divides down to ~0.4 ms/iter — subtract the 'empty scan' row).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np

N = 65536
LEN = 64


def timed(label, body_fn, init_args, reps=3):
    def outer(*args):
        def body(carry, i):
            return body_fn(carry, i, *args[1:]), None
        out, _ = jax.lax.scan(body, args[0], jnp.arange(LEN))
        return out

    c = jax.jit(outer).lower(*init_args).compile()
    out = c(*init_args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = c(*init_args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    t = min(ts) / LEN
    print(f"{label:46s} {t*1e3:9.3f} ms/iter  ({t/N*1e9:6.1f} ns/lane)",
          flush=True)
    return t


def main():
    sys.path.insert(0, "/root/repo")
    from bench import _build_ladybug_problem
    from elaina_tpu.geometry import queries as Q
    from elaina_tpu.geometry.grid import fine_decode
    from elaina_tpu.solver.wost import (init_walk_state, wost_depth_step,
                                        _sample_direction, _neumann_term,
                                        _walk, _separate)

    t0 = time.time()
    problem = _build_ladybug_problem(256, "grid")
    print(f"problem built in {time.time()-t0:.1f}s", flush=True)
    import dataclasses
    from elaina_tpu.geometry.grid import attach_fine
    problem.scene = dataclasses.replace(
        problem.scene, d_grid=attach_fine(problem.scene.d_grid, 1.0))
    scene = problem.scene
    pts = problem.probe.points(jnp.arange(N), (256, 256))
    key = jax.random.PRNGKey(0)
    ngs = scene.neumann.gs

    timed("empty scan (dispatch floor)",
          lambda c, i: c + 1.0, (jnp.float32(0),))

    # fine_decode alone
    fp = scene.d_grid.fine
    timed("fine_decode (1 gather from 1GB)",
          lambda c, i, f, q: c + jnp.sum(fine_decode(f, q + c * 1e-9)[2]),
          (jnp.float32(0), fp, pts))

    # closest_silhouette on the 4-seg box
    timed("closest_silhouette (box)",
          lambda c, i, g, q: c + jnp.sum(
              jnp.where(jnp.isfinite(Q.closest_silhouette(g, q + c * 1e-9)),
                        Q.closest_silhouette(g, q + c * 1e-9), 0.0)),
          (jnp.float32(0), ngs, pts))

    # ray intersect on the box
    dirs = jax.random.normal(key, (N, 2))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    timed("ray_intersect (box)",
          lambda c, i, g, q, d: c + jnp.sum(
              Q.ray_intersect(g, q + c * 1e-9, d, jnp.full((N,), 100.0),
                              48)[1].clip(0, 1e3)),
          (jnp.float32(0), ngs, pts, dirs))

    # sample_in_ball on the box
    u = jax.random.uniform(key, (N,))
    timed("sample_in_ball (box)",
          lambda c, i, g, q, uu: c + jnp.sum(
              Q.sample_in_ball(g, q + c * 1e-9, jnp.full((N,), 50.0),
                               uu)[1]),
          (jnp.float32(0), ngs, pts, u))

    # full _neumann_term
    st0 = init_walk_state(pts, jnp.ones((N,), bool))
    live = jnp.ones((N,), bool)
    timed("_neumann_term (full)",
          lambda c, i, sc, st: c + jnp.sum(_neumann_term(
              sc, st._replace(pos=st.pos + c * 1e-9), live,
              jnp.full((N,), 50.0), jax.random.fold_in(key, i), 1.0, 48)),
          (jnp.float32(0), scene, st0))

    # _walk stage
    timed("_walk (dir sample + ray + update)",
          lambda c, i, sc, st: c + jnp.sum(_walk(
              sc, st._replace(pos=st.pos + c * 1e-9), live,
              jnp.full((N,), 50.0), jax.random.fold_in(key, i), 1.0,
              48).pos),
          (jnp.float32(0), scene, st0))

    # _sample_direction alone
    timed("_sample_direction",
          lambda c, i, st: c + jnp.sum(_sample_direction(
              jax.random.fold_in(key, i + c.astype(jnp.int32) * 0), st,
              2)[0]),
          (jnp.float32(0), st0))

    # full dead step for reference
    st_dead = init_walk_state(pts, jnp.zeros((N,), bool))
    timed("dead step (full)",
          lambda c, i, sc, st: c + jnp.sum(wost_depth_step(
              sc, st._replace(pos=st.pos + c * 1e-9),
              jax.random.fold_in(key, i), 1.0, 48, 48)[1]),
          (jnp.float32(0), scene, st_dead))

    # live step for reference
    timed("live step (full, all lanes)",
          lambda c, i, sc, st: c + jnp.sum(wost_depth_step(
              sc, st._replace(pos=st.pos + c * 1e-9),
              jax.random.fold_in(key, i), 1.0, 48, 48)[1]),
          (jnp.float32(0), scene, st0))


if __name__ == "__main__":
    main()
