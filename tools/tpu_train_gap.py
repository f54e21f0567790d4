#!/usr/bin/env python
"""Isolate the train-phase rate gap (VERDICT r3 next #5: train >= 0.85x
guide).

Times, at 512²-shaped lanes on the ladybug scene (the headline config):
  guide            record-free balanced guide chunk (the 14M/s reference)
  train@never      train chunk, optimizer cond never fires — isolates the
                   RECORD overhead (writes, flush, backfill, train_sel)
  train@N          production cadence variants (optimizer every N iters)

Rate deltas attribute the gap: (guide - train@never) = record machinery,
(train@never - train@N) = amortized optimizer passes.

Usage: python tools/tpu_train_gap.py [--res 512] [--cap 64] [--spp 8]
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

from bench import _build_ladybug_problem

NET = {"encoding": {"otype": "DenseGrid", "base_resolution": 8,
                    "n_levels": 8, "n_features_per_level": 4,
                    "per_level_scale": 1.405},
       "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                   "n_hidden_layers": 3, "activation": "ReLU"},
       "optimizer": {"otype": "Ema", "decay": 0.95,
                     "nested": {"otype": "Adam", "learning_rate": 8e-3,
                                "beta1": 0.9, "beta2": 0.99,
                                "epsilon": 1e-15, "l2_reg": 1e-6}}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    a = ap.parse_args()

    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from elaina_tpu.solver.wost import N_PIECES as S
    from elaina_tpu.solver.wost import build_balanced_pieces

    problem = _build_ladybug_problem(a.res, "grid")
    settings = IntegratorSettings(
        frameSize=(a.res, a.res), samplesPerPixel=256, maxWalkingDepth=64,
        epsilonShell=1.0, trainSppCount=64,
        uniformFractionInTrainingPhase=0.5, uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=10, maxGuidedDepthInGuidingPhase=10)
    integ = GuidedIntegrator(problem, settings, "/tmp/train_gap")
    integ.reset_network(NET)
    scene = problem.scene
    n = a.res * a.res

    rd0, in_shell0, _ = integ._step0(scene)
    resolved = np.asarray(in_shell0 | ~integ.mask)
    pts_np = np.asarray(integ.eval_points)
    rd0_np = np.asarray(rd0)

    rem = np.where(resolved, 0, a.spp).astype(np.int64)
    cost = np.full(n, 8.0)
    piece_pix, piece_quota = build_balanced_pieces(rem, cost, n, S)
    ppos = tuple(jnp.asarray(pts_np[piece_pix, d])
                 for d in range(pts_np.shape[1]))
    prd = jnp.asarray(rd0_np[piece_pix])
    pq = jnp.asarray(piece_quota)
    key = jax.random.PRNGKey(7)
    cap = jnp.int32(a.cap)
    uf = jnp.float32(0.5)
    mgd = jnp.int32(10)

    tchunk = integ._train_chunk_get()
    gchunk = integ._guide_chunk_get()

    def timed(label, fn):
        out = fn()                       # compile + warm
        jax.block_until_ready(out)
        best = None
        for _ in range(a.reps):
            t0 = time.time()
            out = fn()
            jax.block_until_ready(out)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        steps = int(np.asarray(out[3]))
        iters = int(np.asarray(out[4]))
        print(f"{label:16s} wall {best:7.3f}s steps {steps:>11d} "
              f"iters {iters:4d} rate {steps/best/1e6:7.2f} M/s "
              f"({steps/max(iters,1)/n*100:5.1f}% occ)", flush=True)
        return steps / best

    extra = (integ.trainer.ema_params, uf, mgd)
    g = timed("guide", lambda: gchunk(scene, extra, ppos, prd, pq, key, cap))
    t_never = timed("train@never", lambda: tchunk(
        scene, integ.trainer, uf, mgd, ppos, prd, pq, key, cap,
        cap + jnp.int32(1)))
    rates = {}
    for te in (40, 20, 10):
        rates[te] = timed(f"train@{te}", lambda te=te: tchunk(
            scene, integ.trainer, uf, mgd, ppos, prd, pq, key, cap,
            jnp.int32(te)))
    print(f"\nrecord machinery: {100*(1-t_never/g):.1f}% of guide rate")
    for te, r in rates.items():
        print(f"optimizer@{te}: {100*(1-r/t_never):.1f}% of train@never; "
              f"train/guide ratio {r/g:.3f}")


if __name__ == "__main__":
    raise SystemExit(main())
