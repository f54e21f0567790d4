#!/usr/bin/env python
"""Persistent-lane uniform solve throughput on TPU (ladybug)."""
import argparse
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

sys.path.insert(0, "/root/repo")
from bench import _build_ladybug_problem
from elaina_tpu.solver.wost import (compute_step0, make_persistent_chunk,
                                    persistent_carry_from_step0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--iter-chunk", type=int, default=256)
    args = ap.parse_args()

    problem = _build_ladybug_problem(args.res, "grid")
    if problem.scene.d_grid is not None:
        import dataclasses

        from elaina_tpu.geometry.grid import attach_fine
        t0 = time.time()
        g2 = attach_fine(problem.scene.d_grid, 1.0)
        problem.scene = dataclasses.replace(problem.scene, d_grid=g2)
        print(f"fine pack {time.time()-t0:.1f}s", flush=True)
    scene = problem.scene
    n = args.res * args.res
    pts = problem.probe.points(jnp.arange(n), (args.res, args.res))
    mask = jnp.ones((n,), bool)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    step0 = jax.jit(lambda sc, p, m: compute_step0(
        sc, p, m, eps=1.0, d_stack=problem.d_stack, n_stack=problem.n_stack))
    rd0, in_shell0, contrib0 = step0(scene, pts, mask)
    n_shell = int(jnp.sum(in_shell0))
    print(f"step0 prologue {time.time()-t0:.1f}s; in-shell pixels: "
          f"{n_shell}/{n} ({100*n_shell/n:.1f}%)", flush=True)

    chunk = make_persistent_chunk(
        eps=1.0, max_depth=64, spp=args.spp, iter_chunk=args.iter_chunk,
        d_stack=problem.d_stack, n_stack=problem.n_stack)

    def fresh_carry():
        return persistent_carry_from_step0(pts, mask, args.spp, in_shell0,
                                           contrib0)

    # warm up / compile
    t0 = time.time()
    _c, remaining, steps = chunk(scene, pts, mask, rd0, key, fresh_carry())
    int(steps)
    print(f"first chunk (compile+run) {time.time()-t0:.1f}s", flush=True)

    carry = fresh_carry()
    t0 = time.time()
    total_steps = 0
    n_chunks = 0
    while True:
        carry, remaining, steps = chunk(scene, pts, mask, rd0, key, carry)
        total_steps += int(steps)
        n_chunks += 1
        if not bool(remaining):
            break
    dt = time.time() - t0
    walked = n - n_shell
    print(f"solve: {dt:.2f}s, {n_chunks} chunks, {total_steps} walk-steps "
          f"-> {total_steps/dt:.3g} walk-steps/s "
          f"({(total_steps + n_shell*args.spp)/dt:.3g} incl. pre-resolved)",
          flush=True)
    sidx = np.asarray(carry[2])
    print("samples per lane:", sidx.min(), sidx.max(), flush=True)
    acc = np.asarray(carry[1])
    print("mean solution:", acc.mean() / args.spp, flush=True)


if __name__ == "__main__":
    main()
