#!/usr/bin/env python
"""Probe the fused-resolve kernels on the real ladybug tables: set-lane
fractions at the bench eval points, and standalone kernel timings."""
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
    print(f"{label:52s} {t*1e3:9.3f} ms/iter  ({t/N*1e9:6.1f} ns/lane)",
          flush=True)
    return t


def main():
    from bench import _build_ladybug_problem
    from elaina_tpu.geometry.grid import attach_fine, fine_decode
    from elaina_tpu.ops.pallas_resolve import (fetch_colors, kprime_for,
                                               pack_groups, sweep_resolve)
    from elaina_tpu.solver.wost import _separate, init_walk_state

    t0 = time.time()
    problem = _build_ladybug_problem(256, "grid")
    print(f"problem built in {time.time()-t0:.1f}s", flush=True)
    import dataclasses
    problem.scene = dataclasses.replace(
        problem.scene, d_grid=attach_fine(problem.scene.d_grid, 1.0))
    scene = problem.scene
    g = scene.d_grid
    pts = problem.probe.points(jnp.arange(N), (256, 256))
    eps = 1.0

    row, need_f, rl, outside = fine_decode(g.fine, pts)
    need = np.asarray(need_f | outside)
    print(f"need frac at eval pts: {need.mean():.4f} ({need.sum()} lanes)",
          flush=True)

    K = g.cand.shape[1]
    rpp = -(-K // 128)
    kp = kprime_for(K)
    mask = pack_groups(jnp.asarray(need))
    d_exact, t, side, pid = sweep_resolve(mask, row, pts, g.coords, g.cpack,
                                          rpp=rpp, kprime=kp)
    in_shell = need & np.asarray((d_exact < eps) & (t > 0) & (t < 1))
    print(f"in-shell frac: {in_shell.mean():.4f} ({in_shell.sum()})",
          flush=True)

    empty = pack_groups(jnp.zeros((N,), bool))

    def body_sweep(c, i, m, r, q, coords, cpack):
        o = sweep_resolve(m, r, q + c * 1e-9, coords, cpack, rpp=rpp,
                          kprime=kp)
        return c + jnp.sum(jnp.where(jnp.isfinite(o[0]), o[0], 0.0))

    timed("sweep_resolve (empty mask)", body_sweep,
          (jnp.float32(0), empty, row, pts, g.coords, g.cpack))
    timed(f"sweep_resolve (need={need.mean():.2f})", body_sweep,
          (jnp.float32(0), mask, row, pts, g.coords, g.cpack))
    full = pack_groups(jnp.ones((N,), bool))
    timed("sweep_resolve (full mask)", body_sweep,
          (jnp.float32(0), full, row, pts, g.coords, g.cpack))

    # same lane count, CLUSTERED into the first blocks: isolates the
    # per-active-block dense-phase cost from the per-set-lane DMA cost
    n_set = int(need.sum())
    clustered = pack_groups(jnp.arange(N) < n_set)
    row_shuf = jax.random.permutation(jax.random.PRNGKey(3), row)
    timed(f"sweep_resolve (clustered {n_set})", body_sweep,
          (jnp.float32(0), clustered, row_shuf, pts, g.coords, g.cpack))

    cfi = 2 * jnp.maximum(pid, 0) + jnp.where(side < 0, 1, 0)
    cfi = jnp.where(jnp.asarray(in_shell), cfi, 0)
    mshell = pack_groups(jnp.asarray(in_shell))

    def body_col(c, i, m, f, crows):
        o = fetch_colors(m, f + (c * 0).astype(jnp.int32), crows)
        return c + jnp.sum(o[0])

    timed("fetch_colors (empty)", body_col,
          (jnp.float32(0), empty, cfi, g.crows))
    timed(f"fetch_colors (shell={in_shell.mean():.2f})", body_col,
          (jnp.float32(0), mshell, cfi, g.crows))

    # full _separate for reference
    st = init_walk_state(pts, jnp.ones((N,), bool))
    os.environ.pop("ELAINA_DEBUG_NO_FETCH", None)

    def body_sep(c, i, sc, q):
        o = _separate(sc, st._replace(pos=q + c * 1e-9), eps, 48,
                      shrink=True)
        return c + jnp.sum(jnp.where(jnp.isfinite(o[1]), o[1], 0.0))

    timed("_separate (live, fast path)", body_sep,
          (jnp.float32(0), scene, pts))


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
