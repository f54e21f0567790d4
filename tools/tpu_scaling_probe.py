#!/usr/bin/env python
"""Why does steps/s drop from 256^2 to 512^2 lanes?  Runs the balanced
uniform solve at both resolutions with ELAINA_BALANCE_DEBUG on, printing
per-round lanes/cap/iters/occupancy/rate, plus a steady-state chunk probe
(never-exhausting quotas) at each lane count to separate dispatch-floor
effects from round/tail effects.

Usage: python tools/tpu_scaling_probe.py [--scene ladybug] [--spp 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
os.environ["ELAINA_BALANCE_DEBUG"] = "1"
import jax

from elaina_tpu.exec import _apply_platform_env

_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np


def steady_state(problem, n, spp=1_000_000, iters=192):
    """Never-exhausting-quota chunk dispatch: pure per-iteration cost."""
    from elaina_tpu.solver.wost import (N_PIECES, compute_step0,
                                        make_balanced_chunk)

    # attach the FinePack the integrator would (the fast-path gate needs
    # fine.eps == eps) — without it this probe measures the slow chain path
    import dataclasses

    from elaina_tpu.geometry.grid import attach_fine
    if problem.scene.d_grid is not None and problem.scene.d_grid.coords is not None:
        g2 = attach_fine(problem.scene.d_grid, 1.0)
        if g2 is not problem.scene.d_grid:
            problem.scene = dataclasses.replace(problem.scene, d_grid=g2)
    scene = problem.scene
    res = int(np.sqrt(n))
    pts = problem.probe.points(jnp.arange(n), (res, res))
    mask = jnp.ones((n,), bool)
    step0 = jax.jit(lambda sc, p, m: compute_step0(
        sc, p, m, eps=1.0, d_stack=problem.d_stack, n_stack=problem.n_stack))
    rd0, in_shell0, contrib0 = step0(scene, pts, mask)

    chunk = make_balanced_chunk(eps=1.0, max_depth=64,
                                d_stack=problem.d_stack,
                                n_stack=problem.n_stack)
    S = N_PIECES
    pts_np = np.asarray(pts)
    ppos = tuple(jnp.asarray(np.broadcast_to(pts_np[:, d], (S, n)))
                 for d in range(pts_np.shape[1]))
    prd = jnp.asarray(np.broadcast_to(np.asarray(rd0), (S, n)))
    quota = jnp.full((S, n), spp, jnp.int32)
    key = jax.random.PRNGKey(0)

    out = chunk(scene, (), ppos, prd, quota, key, jnp.int32(8))
    jax.block_until_ready(out)
    t0 = time.time()
    out = chunk(scene, (), ppos, prd, quota, key, jnp.int32(iters))
    jax.block_until_ready(out)
    wall = time.time() - t0
    steps = int(out[3])
    it = int(out[4])
    print(f"[steady] n={n} iters={it} steps={steps} wall={wall:.2f}s "
          f"rate={steps/wall/1e6:.1f}M/s "
          f"per_iter={wall/max(it,1)*1e3:.2f}ms "
          f"ns_per_lane={wall/max(it,1)/n*1e9:.0f}", flush=True)


def full_solve(problem, res, spp):
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.integrator import UniformIntegrator

    s = IntegratorSettings(frameSize=(res, res), samplesPerPixel=spp,
                          maxWalkingDepth=64, epsilonShell=1.0)
    integ = UniformIntegrator(problem, s, "/tmp/scaling")
    integ.prepare()
    t0 = time.time()
    ms = integ.solve()
    steps = integ.total_walk_steps
    print(f"[solve] res={res} spp={spp} ms={ms} "
          f"rate={steps/(ms/1e3)/1e6:.1f}M/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--steady-only", action="store_true")
    a = ap.parse_args()

    from bench import _build_ladybug_problem

    for res in (256, 512):
        problem = _build_ladybug_problem(res, "grid")
        steady_state(problem, res * res)
        if not a.steady_only:
            full_solve(problem, res, a.spp)


if __name__ == "__main__":
    main()
