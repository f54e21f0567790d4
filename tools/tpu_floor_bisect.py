#!/usr/bin/env python
"""Bisect the fixed (live-count-independent) cost of one depth step.

The all-dead step costs ~13 ms at 65k lanes even though every row DMA is
skipped — this tool times each fixed-cost suspect standalone: row-resolve
gathers, surface-color gathers, the Pallas call with all lanes skipped vs
all fetching, and RNG.  All device data is passed as jit ARGUMENTS (a
closure-captured grid bakes multi-GB tables into the remote-compile
payload and wedges the tunnel).
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

import jax.numpy as jnp
import numpy as np


def timed_scan(label, body_fn, init_args, length=8, reps=3):
    """Time `length` sequential applications inside one dispatch; report
    the marginal per-iteration cost (removes the ~20ms dispatch floor).
    body_fn(carry, i, *rest) -> carry."""
    def outer(*args):
        def body(carry, i):
            return body_fn(carry, i, *args[1:]), None
        out, _ = jax.lax.scan(body, args[0], jnp.arange(length))
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
    print(f"{label:44s} {min(ts)/length*1e3:9.2f} ms/iter "
          f"({min(ts)*1e3:.1f} total)", flush=True)
    return min(ts) / length


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from bench import _build_ladybug_problem
    from elaina_tpu.geometry.grid import grid_row_index
    from elaina_tpu.ops.pallas_queries import grid_band_dma_2d
    from elaina_tpu.solver.wost import init_walk_state, wost_depth_step

    t0 = time.time()
    problem = _build_ladybug_problem(args.res, "grid")
    print(f"problem built in {time.time()-t0:.1f}s", flush=True)
    scene = problem.scene
    n = args.res * args.res
    pts = problem.probe.points(jnp.arange(n), (args.res, args.res))
    key = jax.random.PRNGKey(0)

    # 1) row resolve (meta-level gathers) for all lanes
    timed_scan("grid_row_index (all lanes)",
               lambda c, i, g, q: c + jnp.sum(grid_row_index(g, q + c * 1e-9)),
               (jnp.float32(0), scene.d_grid, pts))

    # 1b) single plain gather of n elements from a large table
    big = jnp.arange(844636, dtype=jnp.float32)
    lin = jnp.arange(n, dtype=jnp.int32) * 7 % big.shape[0]
    timed_scan("one (N,) gather from 845k table",
               lambda c, i, t, l: c + jnp.sum(t[(l + i) % t.shape[0]]),
               (jnp.float32(0), big, lin))

    # 2) Pallas sweep, all lanes skipped vs all fetched
    g = scene.d_grid
    rpp = -(-g.cand.shape[1] // 128)
    row_skip = jnp.full((n,), -1, jnp.int32)
    row_all = jax.jit(grid_row_index)(g, pts)

    def pallas_sweep(c, i, row, q, coords):
        d2, slot, _ = grid_band_dma_2d(row, q + c * 1e-9, coords, rpp)
        return c + jnp.sum(jnp.where(row >= 0, d2, 0.0))
    timed_scan("pallas sweep (all rows skipped)", pallas_sweep,
               (jnp.float32(0), row_skip, pts, g.coords))
    timed_scan("pallas sweep (all rows fetched)", pallas_sweep,
               (jnp.float32(0), row_all, pts, g.coords))

    # 3) surface-color gathers for all lanes
    colors = scene.dirichlet.colors
    idx_tab = scene.dirichlet.gs.indices
    pid = jnp.arange(n, dtype=jnp.int32) % idx_tab.shape[0]

    def color_gather(c, i, colors, idx_tab, pid):
        p = (pid + i) % idx_tab.shape[0]
        vi = idx_tab[p]
        v0 = colors[vi[:, 0], 0]
        v1 = colors[vi[:, 1], 1]
        return c + jnp.sum(v0) + jnp.sum(v1)
    timed_scan("surface-color gathers (all lanes)", color_gather,
               (jnp.float32(0), colors, idx_tab, pid))

    # 4) RNG streams (split + 4 uniform draws)
    def rng_cost(c, i, k):
        kk = jax.random.fold_in(k, i + c.astype(jnp.int32) * 0)
        k1, k2, k3, k4 = jax.random.split(kk, 4)
        u = (jax.random.uniform(k1, (n,)) + jax.random.uniform(k2, (n,))
             + jax.random.uniform(k3, (n,)) + jax.random.uniform(k4, (n,)))
        return c + jnp.sum(u)
    timed_scan("rng (4 streams of n uniforms)", rng_cost,
               (jnp.float32(0), key))

    # 5) all-dead step under knockouts
    st0 = init_walk_state(pts, jnp.zeros((n,), bool))

    def dead_step(c, i, sc, st):
        st, contrib = wost_depth_step(
            sc, st._replace(pos=st.pos + c * 1e-9), jax.random.fold_in(key, i),
            1.0, problem.d_stack, problem.n_stack)
        return c + jnp.sum(contrib) + jnp.sum(st.pos) * 0

    for label, env in (
        ("dead step (baseline)", {}),
        ("dead step NO_COLOR", {"ELAINA_DEBUG_NO_COLOR": "1"}),
        ("dead step NO_COLOR+NO_FETCH", {"ELAINA_DEBUG_NO_COLOR": "1",
                                         "ELAINA_DEBUG_NO_FETCH": "1"}),
        ("dead step XLA band (no pallas)", {"ELAINA_PALLAS": "0"}),
    ):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            timed_scan(label, dead_step, (jnp.float32(0), scene, st0))
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
