#!/usr/bin/env python
"""Bisect the TPU scan-length crash: run uniform WoSt run_one_sample at
increasing max_depth values, timing compile and execute separately.

Usage: python tools/tpu_bisect_scan.py [--res N] [--depths 1,4,16,64]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--depths", default="1,4,16,64")
    ap.add_argument("--scene", default="ladybug")
    ap.add_argument("--accel", default="grid")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    sys.path.insert(0, "/root/repo")
    from bench import _build_ladybug_problem, _build_square_problem
    from elaina_tpu.solver.wost import run_one_sample

    t0 = time.time()
    if args.scene == "ladybug":
        problem = _build_ladybug_problem(args.res, args.accel)
    else:
        problem = _build_square_problem(args.res, args.accel)
    print(f"problem built in {time.time()-t0:.1f}s", flush=True)

    scene = problem.scene
    n = args.res * args.res
    pix = jnp.arange(n)
    pts = problem.probe.points(pix, (args.res, args.res))
    mask = jnp.ones((n,), bool)

    for depth in [int(d) for d in args.depths.split(",")]:
        def fn(sc, p, m, k, _depth=depth):
            return run_one_sample(sc, p, m, k, eps=1.0, max_depth=_depth,
                                  d_stack=problem.d_stack,
                                  n_stack=problem.n_stack)
        jf = jax.jit(fn)
        t0 = time.time()
        lowered = jf.lower(scene, pts, mask, jax.random.PRNGKey(0))
        compiled = lowered.compile()
        t_compile = time.time() - t0
        print(f"depth={depth:3d} compiled in {t_compile:7.1f}s", flush=True)
        t0 = time.time()
        out, steps = compiled(scene, pts, mask, jax.random.PRNGKey(0))
        out.block_until_ready()
        t_exec = time.time() - t0
        # second execution: steady-state timing
        t0 = time.time()
        out, steps = compiled(scene, pts, mask, jax.random.PRNGKey(1))
        out.block_until_ready()
        t_exec2 = time.time() - t0
        sps = int(steps) / max(t_exec2, 1e-9)
        print(f"depth={depth:3d} exec1={t_exec:7.2f}s exec2={t_exec2:7.3f}s "
              f"steps={int(steps)} -> {sps:.3g} walk-steps/s", flush=True)


if __name__ == "__main__":
    main()
