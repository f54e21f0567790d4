#!/usr/bin/env python
"""3D RMSE parity vs the ANALYTIC solution (VERDICT r2 next #4).

The bumpy3d scene's Dirichlet BC is h(x) = 0.5 + 0.4 (x² − y²)/s² —
harmonic, so the interior Laplace solution is h itself
(tools/make_scene3d.py).  Solves uniform and guided at matched spp on the
TPU and reports RMSE against h on the evaluation plane plus steps/s.
Writes BENCH_parity3d.json.

Usage: python tools/tpu_parity3d.py [--res 256] [--spp 64] [--train 16]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

from elaina_tpu.exec import _apply_platform_env

_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np


def analytic_image(problem, res):
    import jax.numpy as jnp
    pts = np.asarray(problem.probe.points(jnp.arange(res * res), (res, res)))
    s = 1.0  # make_scene3d: h uses the deformed-unit-sphere scale
    return 0.5 + 0.4 * (pts[:, 0] ** 2 - pts[:, 1] ** 2) / (s * s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--train", type=int, default=16)
    ap.add_argument("--out", default="BENCH_parity3d.json")
    a = ap.parse_args()

    from bench import _build_bumpy3d_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from elaina_tpu.solver.integrator import UniformIntegrator

    problem = _build_bumpy3d_problem("grid")
    res = a.res
    ref = analytic_image(problem, res)

    rows = []

    def run(cls, spp, train=0, net=None):
        st = IntegratorSettings(
            frameSize=(res, res), samplesPerPixel=spp, maxWalkingDepth=64,
            epsilonShell=0.01, trainSppCount=train,
            uniformFractionInTrainingPhase=0.5,
            uniformFractionInGuidingPhase=0.5,
            maxGuidedDepthInTrainingPhase=10,
            maxGuidedDepthInGuidingPhase=10)
        integ = cls(problem, st, "/tmp/parity3d")
        if net is not None:
            integ.reset_network(net)
        if hasattr(integ, "prepare"):
            integ.prepare()
        t0 = time.time()
        ms = integ.solve()
        img = np.asarray(integ.films["SOLUTION"].pixels())[..., 0].reshape(-1)
        rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
        steps = int(integ.total_walk_steps)
        row = {"estimator": cls.__name__, "spp": spp, "train_spp": train,
               "rmse": rmse, "ms": ms,
               "steps_per_s": steps / max(ms / 1e3, 1e-9)}
        print(row, flush=True)
        rows.append(row)
        return rmse

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
    r_u = run(UniformIntegrator, a.spp)
    r_g = run(GuidedIntegrator, a.spp, a.train, net_conf)
    rows[-1]["rmse_ratio_vs_uniform"] = r_g / max(r_u, 1e-12)

    out = {"scene": "bumpy3d", "res": res, "gt": "analytic", "rows": rows}
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
