#!/usr/bin/env python
"""Diagnose guiding quality on the spot scene (CPU-sized).

Trains the guide on the spot scene (one bright arc on a dark boundary),
then reports, at a grid of interior points:
  * the learned selection probability,
  * the angle between the dominant vMM lobe's mean and the true direction
    to the bright arc's center,
  * the dominant lobe's kappa and weight.

A working guide should show sp -> high and mean-direction errors far
below the ~57 deg random-direction average, with kappa >> 1.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# The axon sitecustomize resolves the platform at interpreter startup:
# env mutations inside the script are too late.  Re-exec with the env set.
if (os.environ.get("ELAINA_DIAG_TPU") != "1"
        and os.environ.get("JAX_PLATFORM_NAME") != "cpu"):
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--train-spp", type=int, default=16)
    a = ap.parse_args()

    import jax

    from bench import _build_ladybug_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from tools.tpu_parity import _respot_colors

    res = a.res
    problem = _build_ladybug_problem(res, "grid")
    problem = _respot_colors(problem)

    # bright-arc center in world space
    gs = problem.scene.dirichlet.gs
    V = gs.verts.shape[0]
    lo_i = int(0.35 * V)
    hi_i = lo_i + max(4, int(0.01 * V))
    arc_center = np.asarray(gs.verts[lo_i:hi_i]).mean(axis=0)
    print("bright arc center:", arc_center)

    settings = IntegratorSettings(
        frameSize=(res, res), samplesPerPixel=a.train_spp + 1,
        maxWalkingDepth=64, epsilonShell=1.0, trainSppCount=a.train_spp,
        uniformFractionInTrainingPhase=0.5, uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=10, maxGuidedDepthInGuidingPhase=10)

    net_conf = {
        "encoding": {"otype": "DenseGrid", "base_resolution": 8,
                     "n_levels": 8, "n_features_per_level": 4,
                     "per_level_scale": 1.405},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 3, "activation": "ReLU"},
        "optimizer": {"otype": "Ema", "decay": 0.95,
                      "nested": {"otype": "Adam", "learning_rate": 8e-3,
                                 "beta1": 0.9, "beta2": 0.99,
                                 "epsilon": 1e-15, "l2_reg": 1e-6}},
    }

    integ = GuidedIntegrator(problem, settings, "/tmp/spot_diag")
    integ.reset_network(net_conf)
    t0 = time.time()
    integ.solve()
    print(f"solve: {time.time() - t0:.1f}s; "
          f"loss history (first/last 5): {integ.loss_history[:5]} ... "
          f"{integ.loss_history[-5:]}")

    # probe points: ring at several radii around the domain center
    import jax.numpy as jnp

    from elaina_tpu.nn.network import apply_network
    from elaina_tpu.solver.distributions import (
        vmm_from_raw, vmm_selection_prob)
    from elaina_tpu.solver.guided import normalize_coord

    scene = problem.scene
    pts = []
    for rad in (60.0, 120.0, 180.0):
        for th in np.linspace(0, 2 * np.pi, 8, endpoint=False):
            pts.append([250 + rad * np.cos(th), 250 + rad * np.sin(th)])
    pts = np.asarray(pts, np.float32)

    x = normalize_coord(jnp.asarray(pts), scene.aabb_lo, scene.aabb_hi)
    raw = apply_network(integ.spec, integ.trainer.ema_params, x)
    vmm = vmm_from_raw(raw, 2)
    sp = np.asarray(vmm_selection_prob(raw, 2))

    true_dir = arc_center[None] - pts
    true_dir /= np.linalg.norm(true_dir, axis=-1, keepdims=True)

    w = np.asarray(vmm.weight)
    mu = np.asarray(vmm.mu)
    kap = np.asarray(vmm.kappa)
    kmax = w.argmax(axis=-1)
    rows = []
    for i in range(len(pts)):
        m = mu[i, kmax[i]]
        cosang = float(np.clip(np.dot(m, true_dir[i]), -1, 1))
        # mixture-mean direction error (weight-averaged mean vector)
        mixmean = (w[i][:, None] * mu[i] *
                   (1.0 - 1.0 / np.maximum(kap[i][:, None], 1e-3))).sum(0)
        nm = np.linalg.norm(mixmean)
        mixcos = float(np.dot(mixmean / nm, true_dir[i])) if nm > 1e-6 else 0.0
        rows.append((pts[i], sp[i], np.degrees(np.arccos(cosang)),
                     kap[i, kmax[i]], w[i, kmax[i]],
                     np.degrees(np.arccos(np.clip(mixcos, -1, 1)))))
    print(f"{'point':>18} {'selP':>6} {'lobeErr':>8} {'kappa':>8} "
          f"{'w':>5} {'mixErr':>8}")
    for p, s, e, k, wt, me in rows:
        print(f"({p[0]:7.1f},{p[1]:7.1f}) {s:6.3f} {e:8.1f} {k:8.2f} "
              f"{wt:5.2f} {me:8.1f}")
    print("mean lobeErr:", np.mean([r[2] for r in rows]),
          "mean selP:", float(sp.mean()))


if __name__ == "__main__":
    main()
