#!/usr/bin/env python
"""Steady-state balanced-chunk throughput (uniform WoSt, ladybug, TPU).

Runs make_balanced_chunk with a large per-lane quota so lanes never
drain: measures the real occupancy-weighted walk-steps/s of the
production solve loop, and the mean live-lane fraction.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--mode", default="uniform",
                    choices=["uniform", "guide"])
    a = ap.parse_args()

    from bench import _build_ladybug_problem
    from elaina_tpu.geometry.grid import attach_fine
    from elaina_tpu.solver.wost import (N_PIECES, compute_step0,
                                        make_balanced_chunk)

    t0 = time.time()
    problem = _build_ladybug_problem(256, "grid")
    import dataclasses
    problem.scene = dataclasses.replace(
        problem.scene, d_grid=attach_fine(problem.scene.d_grid, 1.0))
    scene = problem.scene
    print(f"problem built in {time.time()-t0:.1f}s", flush=True)

    n = a.n
    npx = 65536
    pts = problem.probe.points(jnp.arange(npx), (256, 256))
    pts_np = np.asarray(pts)

    extra_val = None
    if a.mode == "guide":
        from elaina_tpu.nn.network import init_trainer, make_network
        from elaina_tpu.solver import guided as G
        from elaina_tpu.solver.distributions import n_dim_output
        conf = {"encoding": {"otype": "DenseGrid", "base_resolution": 8,
                             "n_levels": 8, "n_features_per_level": 4,
                             "per_level_scale": 1.405},
                "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                            "n_hidden_layers": 3, "activation": "ReLU"}}
        spec = make_network(2, n_dim_output(2), conf)
        tr = init_trainer(jax.random.PRNGKey(0), spec)

        def g_step(sc, extra, st, k, wstep, step0):
            params, uf, mgd = extra
            st, _, contrib = G.guided_depth_step(
                sc, spec, params, st, None, k, wstep, jnp.bool_(True),
                jnp.bool_(False), uf, mgd, eps=1.0,
                d_stack=problem.d_stack, n_stack=problem.n_stack,
                step0=step0)
            return st, contrib

        chunk = make_balanced_chunk(g_step, eps=1.0, max_depth=64,
                                    d_stack=problem.d_stack,
                                    n_stack=problem.n_stack)
        extra_val = (tr.ema_params, jnp.float32(0.5), jnp.int32(10))
    else:
        chunk = make_balanced_chunk(eps=1.0, max_depth=64,
                                    d_stack=problem.d_stack,
                                    n_stack=problem.n_stack)
    chunk = jax.jit(chunk)

    S = N_PIECES
    rng = np.random.default_rng(0)
    pix = rng.integers(0, npx, (S, n))
    rd0_all, _, _ = compute_step0(scene, pts, jnp.ones((npx,), bool),
                                  eps=1.0, d_stack=problem.d_stack)
    rd0_np = np.asarray(rd0_all)
    piece_px = jnp.asarray(pts_np[pix, 0])
    piece_py = jnp.asarray(pts_np[pix, 1])
    piece_rd0 = jnp.asarray(rd0_np[pix])
    piece_quota = jnp.full((S, n), a.spp, jnp.int32)
    key = jax.random.PRNGKey(0)

    out = chunk(scene, extra_val, (piece_px, piece_py), piece_rd0,
                piece_quota, key, jnp.int32(8))
    jax.block_until_ready(out)

    t0 = time.time()
    out = chunk(scene, extra_val, (piece_px, piece_py), piece_rd0,
                piece_quota, key, jnp.int32(a.iters))
    acc, done, lane_steps, steps, iters = out[:5]
    steps = int(steps)
    iters = int(iters)
    dt = time.time() - t0
    occ = steps / (iters * n)
    print(f"iters={iters} steps={steps} wall={dt:.2f}s "
          f"steps/s={steps/dt:.3e} occupancy={occ:.3f} "
          f"ms/iter={dt/iters*1e3:.3f}", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
