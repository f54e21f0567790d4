#!/usr/bin/env python
"""Time the fresh-cache problem build (VERDICT r1 #8: fille grid cold start).

Builds the scene with the candidate-grid cache DISABLED and prints a stage
breakdown: OBJ+BVH, candidate grid (count/band passes per level), coords
table, FinePack.  XLA compilation cache stays enabled (a fresh *scene*
does not imply a fresh executable cache).

Usage: python tools/coldstart.py [--scene fille|ladybug] [--no-xla-cache]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="fille")
    ap.add_argument("--no-xla-cache", action="store_true")
    a = ap.parse_args()

    import jax

    if not a.no_xla_cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])

    from elaina_tpu.core.problem import load_obj
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.geometry.grid import (attach_coords, attach_fine,
                                          build_candidate_grid)

    paths = {
        "fille": "/root/reference/data/fille/model.obj",
        "ladybug": "/root/reference/data/ladybug/model.obj",
    }
    t0 = time.time()
    v, idx = load_obj(paths[a.scene], 2)
    t1 = time.time()
    gs, depth = make_geom_set(v, idx)
    t2 = time.time()
    print(f"obj: {t1 - t0:.1f}s  geomset(BVH+sil): {t2 - t1:.1f}s  "
          f"prims={idx.shape[0]}")

    lo = v.min(0) - 0.05 * (v.max(0) - v.min(0))
    hi = v.max(0) + 0.05 * (v.max(0) - v.min(0))
    t3 = time.time()
    grid = build_candidate_grid(v, idx, lo, hi, cache_dir=None)
    jax.block_until_ready(grid.cand)
    t4 = time.time()
    print(f"candidate grid: {t4 - t3:.1f}s  rows={grid.cand.shape} "
          f"levels={len(grid.meta)}")

    grid = attach_coords(grid, v, idx)
    jax.block_until_ready(grid.coords)
    t5 = time.time()
    print(f"coords: {t5 - t4:.1f}s")

    grid = attach_fine(grid, 1e-2 * float(np.max(hi - lo)))
    if grid.fine is not None:
        jax.block_until_ready(grid.fine.packed)
    t6 = time.time()
    print(f"finepack: {t6 - t5:.1f}s")
    print(f"TOTAL fresh build: {t6 - t0:.1f}s")


if __name__ == "__main__":
    main()
