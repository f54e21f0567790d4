#!/usr/bin/env python
"""Weak-scaling measurement on the virtual CPU mesh (VERDICT r4 #8).

Fixed PER-DEVICE work: W lanes x Q samples per device, the balanced
chunk sharded over an n-device mesh (wost.make_balanced_chunk(mesh=...)).
Runs n = 1 and n = 8 on the 8-virtual-device CPU backend and reports
wall + parallel efficiency.

CAVEAT (recorded in the output): this host exposes ONE physical core, so
the 8-device row measures XLA's host-threading overhead, not real-chip
scaling — per-device dispatches serialize onto the core.  The design
point the row validates is the COLLECTIVE structure: per-device
worklists drain independently (no per-iteration cross-chip sync; the
only collectives are the final psum/pmax), so ideal-hardware efficiency
is bounded by the tail-straggler psum, not by per-step communication.
The real-chip path is exercised by dryrun_multichip and the
tests/test_parallel_solve.py mesh suite.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/cpu_weak_scaling.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from bench import _build_square_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.parallel.dp import make_mesh
    from elaina_tpu.solver.integrator import UniformIntegrator
    from elaina_tpu.solver.wost import (N_PIECES, compute_step0,
                                        make_balanced_chunk)

    problem = _build_square_problem(64, "grid")
    scene = problem.scene
    W = 4096          # lanes per device
    Q = 4             # samples per lane
    depth = 32

    integ = UniformIntegrator(problem, IntegratorSettings(
        frameSize=(64, 64), samplesPerPixel=1, maxWalkingDepth=depth,
        epsilonShell=1.0), "/tmp/weak")
    base_pts = np.asarray(integ.eval_points)

    rows = []
    for n_dev in (1, 8):
        n = W * n_dev
        pts = np.tile(base_pts, (-(-n // base_pts.shape[0]), 1))[:n]
        rd0, _, _ = compute_step0(scene, jnp.asarray(pts),
                                  jnp.ones((n,), bool), eps=1.0,
                                  d_stack=problem.d_stack,
                                  n_stack=problem.n_stack)
        S = N_PIECES
        piece_pos = tuple(jnp.tile(jnp.asarray(pts[:, d])[None], (S, 1))
                          for d in range(2))
        piece_rd0 = jnp.tile(jnp.asarray(rd0)[None], (S, 1))
        quota = jnp.zeros((S, n), jnp.int32).at[0].set(Q)
        mesh = make_mesh(n_dev) if n_dev > 1 else None
        chunk = make_balanced_chunk(None, eps=1.0, max_depth=depth,
                                    d_stack=problem.d_stack,
                                    n_stack=problem.n_stack, mesh=mesh)
        args = (scene, None, piece_pos, piece_rd0, quota,
                jax.random.PRNGKey(0), jnp.int32(depth + 2 * Q * 8))
        out = chunk(*args)          # compile
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = chunk(*args)
            jax.block_until_ready(out)
        wall = (time.time() - t0) / reps
        steps = int(np.asarray(out[3]).reshape(-1)[0])
        rows.append({"devices": n_dev, "lanes": n, "steps": steps,
                     "wall_s": round(wall, 3),
                     "steps_per_s": steps / wall})
        print(rows[-1], flush=True)

    eff = (rows[1]["steps_per_s"] / rows[0]["steps_per_s"]) / 1.0
    out = {"weak_scaling": rows,
           "throughput_ratio_8_over_1": round(eff, 3),
           "caveat": "single physical core host: 8 virtual devices "
                     "serialize; this validates collective structure, "
                     "not real-chip scaling"}
    with open("/root/repo/BENCH_weakscaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
