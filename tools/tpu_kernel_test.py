#!/usr/bin/env python
"""Minimal TPU compile/run test for the grid band DMA kernel."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax
import jax.numpy as jnp
import numpy as np

print("backend", jax.default_backend(), flush=True)

sys.path.insert(0, "/root/repo")
from bench import _build_ladybug_problem
from elaina_tpu.geometry.grid import grid_closest_point, grid_row_index

t0 = time.time()
problem = _build_ladybug_problem(256, "grid")
print(f"problem built {time.time()-t0:.1f}s", flush=True)
scene = problem.scene
gs = scene.dirichlet.gs
print("coords", None if scene.d_grid.coords is None else scene.d_grid.coords.shape,
      "cand", scene.d_grid.cand.shape, "levels", len(scene.d_grid.meta), flush=True)

n = 256 * 256
pts = problem.probe.points(jnp.arange(n), (256, 256))

f = jax.jit(lambda sc, q: grid_closest_point(sc.d_grid, sc.dirichlet.gs.verts,
                                             sc.dirichlet.gs.indices, q))
t0 = time.time()
c = f.lower(scene, pts).compile()
print(f"compiled {time.time()-t0:.1f}s", flush=True)

for rep in range(3):
    t0 = time.time()
    d, pid = c(scene, pts)
    s = float(np.asarray(d).sum())
    print(f"exec {time.time()-t0:7.3f}s  sum={s:.6g}", flush=True)

# XLA aligned-tile-gather variant: coords[row] is a (8,128)-tile row gather
rpp = -(-scene.d_grid.cand.shape[1] // 128)


def xla_tile_gather(sc, q):
    g = sc.d_grid
    row = grid_row_index(g, q)
    blk = g.coords[row]                       # (N, n_rows, 128)
    qx = q[:, 0][:, None, None]
    qy = q[:, 1][:, None, None]
    ax = blk[:, 0 * rpp:1 * rpp, :]
    ay = blk[:, 1 * rpp:2 * rpp, :]
    bx = blk[:, 2 * rpp:3 * rpp, :]
    by = blk[:, 3 * rpp:4 * rpp, :]
    ex, ey = bx - ax, by - ay
    wx, wy = qx - ax, qy - ay
    den = jnp.maximum(ex * ex + ey * ey, 1e-30)
    t = jnp.clip((wx * ex + wy * ey) / den, 0.0, 1.0)
    dx, dy = wx - t * ex, wy - t * ey
    d2 = dx * dx + dy * dy
    return jnp.sqrt(jnp.min(d2, axis=(1, 2)))


fg = jax.jit(xla_tile_gather)
cg = fg.lower(scene, pts).compile()
for rep in range(2):
    t0 = time.time()
    dg = cg(scene, pts)
    sg = float(np.asarray(dg).sum())
    print(f"xla tile-gather exec {time.time()-t0:7.3f}s sum={sg:.6g}", flush=True)

# correctness vs the XLA fallback path
os.environ["ELAINA_PALLAS"] = "0"
f2 = jax.jit(lambda sc, q: grid_closest_point(sc.d_grid, sc.dirichlet.gs.verts,
                                              sc.dirichlet.gs.indices, q))
c2 = f2.lower(scene, pts).compile()
t0 = time.time()
d2_, pid2 = c2(scene, pts)
dd = np.asarray(d)
dx = np.asarray(d2_)
print(f"xla path exec {time.time()-t0:.3f}s  max|diff| = {np.abs(dd-dx).max():.3g}",
      flush=True)
