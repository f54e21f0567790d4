#!/usr/bin/env python
"""Measure the Neumann band-query NEED fraction (BASELINE round-5 plan).

The fused band kernel runs on every live lane each step; a lane whose
star ball cannot reach any Neumann prim (R_B <= PrimBandGrid.lbound of
its cell) could take a trivial path via lane compaction.  The win is
bounded by 1/need_fraction — this probe measures the fraction over the
live-lane-step distribution of a real walk, per depth and overall.

Usage: python tools/tpu_band_need.py [--scene neumann3d] [--steps 64]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

from elaina_tpu.exec import _apply_platform_env

_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="neumann3d")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    a = ap.parse_args()

    from bench import _build_conf_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.geometry import queries as Q
    from elaina_tpu.solver.integrator import UniformIntegrator
    from elaina_tpu.solver.wost import (_separate, init_walk_state,
                                        wost_depth_step)

    problem = _build_conf_problem(f"{a.scene}_u.json", "grid")
    st_cfg = IntegratorSettings(
        frameSize=(a.res, a.res), samplesPerPixel=1, maxWalkingDepth=64,
        epsilonShell=0.01)
    integ = UniformIntegrator(problem, st_cfg, "/tmp/bandneed")
    scene = problem.scene
    eps = float(st_cfg.epsilonShell)
    ds, ns = problem.d_stack, problem.n_stack
    bg = scene.n_bgrid
    assert bg is not None, "no prim band grid on this scene"

    # scene/bg as jit ARGUMENTS (captured constants ship inside the
    # compile payload and break remote-compile setups — see the NOTE in
    # solver/integrator.py)
    @jax.jit
    def step(sc, g, state, key):
        in_shell, R_B, _, _ = _separate(sc, state, eps, ds, shrink=True)
        lin, outside = Q.band_cell(g, state.pos)
        lb = g.lbound[jnp.where(outside, 0, lin)]
        live = state.active & ~in_shell
        need = live & (outside | (R_B > lb))
        st2, _ = wost_depth_step(sc, state, key, eps, ds, ns)
        return st2, jnp.sum(live), jnp.sum(need)

    pts = integ.eval_points
    mask = jnp.asarray(integ.mask)
    state = init_walk_state(pts, mask)
    key = jax.random.PRNGKey(7)
    rows, tot_live, tot_need = [], 0, 0
    for t in range(a.steps):
        state, live, need = step(scene, bg, state, jax.random.fold_in(key, t))
        live, need = int(live), int(need)
        if live == 0:
            break
        rows.append({"depth": t, "live": live, "need": need,
                     "frac": need / max(live, 1)})
        tot_live += live
        tot_need += need
    for r in rows[:8] + rows[8::8]:
        print(r, flush=True)
    out = {"scene": a.scene, "steps_measured": len(rows),
           "total_live": tot_live, "total_need": tot_need,
           "need_fraction": tot_need / max(tot_live, 1),
           "max_win_bound": tot_live / max(tot_need, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
