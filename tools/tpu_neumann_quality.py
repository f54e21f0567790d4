#!/usr/bin/env python
"""Guided-vs-uniform quality on the Neumann-heavy scene (VERDICT r4 #5).

Every round-4 quality row was Dirichlet-only — the static Dirichlet skip
compiles the reflection folding OUT of those scenes.  This measures the
paper protocol (equal-spp + both equal-time squeezes) on neumann3d,
where the hemisphere branch, Neumann folding and the reflected vmm_pdf
sweep all execute (guided/integrator.cu:824-836 parity path).

GT: high-spp uniform on the same scene (cached on disk).

Usage: python tools/tpu_neumann_quality.py [--res 128] [--gt-spp 1024]
       [--spp 64] [--equal-time]
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

CACHE = "/root/repo/.cache/refprotocol"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--gt-spp", type=int, default=1024)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--equal-time", action="store_true")
    ap.add_argument("--out", default="/root/repo/BENCH_neumann.json")
    a = ap.parse_args()

    from bench import _build_conf_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from elaina_tpu.solver.integrator import UniformIntegrator
    from tools.rmse import rmse
    from tools.tpu_parity import solve_image

    # tri-plane 3D encoding (nn/encoding.py), reference n.json hyperparams
    net_conf = {
        "encoding": {"otype": "DenseGrid", "base_resolution": 8,
                     "n_levels": 4, "n_features_per_level": 4,
                     "per_level_scale": 1.405},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 3, "activation": "ReLU"},
        "optimizer": {"otype": "Ema", "decay": 0.95,
                      "nested": {"otype": "Adam", "learning_rate": 8e-3,
                                 "beta1": 0.9, "beta2": 0.99,
                                 "epsilon": 1e-15, "l2_reg": 1e-6}},
    }
    res = a.res

    def settings(spp, train=0):
        return IntegratorSettings(
            frameSize=(res, res), samplesPerPixel=spp, maxWalkingDepth=64,
            epsilonShell=0.01, trainSppCount=train,
            uniformFractionInTrainingPhase=0.5,
            uniformFractionInGuidingPhase=0.5,
            maxGuidedDepthInTrainingPhase=10,
            maxGuidedDepthInGuidingPhase=10)

    problem = _build_conf_problem("neumann3d_u.json", "grid")
    print(f"scene=neumann3d res={res}", flush=True)

    os.makedirs(CACHE, exist_ok=True)
    gt_path = os.path.join(CACHE, f"neumann3d_{res}_gt{a.gt_spp}.npz")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)["img"]
        print(f"GT loaded from {gt_path}", flush=True)
    else:
        gt, ms, _, _ = solve_image(problem, UniformIntegrator,
                                   settings(a.gt_spp))
        np.savez_compressed(gt_path, img=np.asarray(gt, np.float32))
        print(f"GT uniform {a.gt_spp} spp: {ms:.0f} ms", flush=True)

    rows = []
    spp = a.spp
    ui, ums, _, usteps = solve_image(problem, UniformIntegrator,
                                     settings(spp))
    r_u = rmse(ui, gt)
    rows.append({"estimator": "uniform", "spp": spp, "rmse": r_u,
                 "ms": ums, "steps_per_s": usteps / (ums / 1e3)})
    print(rows[-1], flush=True)

    train = max(4, spp // 4)
    gi, gms, _, gsteps = solve_image(problem, GuidedIntegrator,
                                     settings(spp, train), net_conf)
    r_g = rmse(gi, gt)
    rows.append({"estimator": "guided", "spp": spp, "train_spp": train,
                 "rmse": r_g, "ms": gms,
                 "steps_per_s": gsteps / (gms / 1e3),
                 "rmse_ratio_vs_uniform": r_g / r_u,
                 "time_ratio_vs_uniform": gms / ums})
    print(rows[-1], flush=True)

    if a.equal_time:
        gi2, gems, _, _ = solve_image(problem, GuidedIntegrator,
                                      settings(4 * spp, train), net_conf,
                                      time_budget_s=ums / 1e3)
        r_gt_ = rmse(gi2, gt)
        rows.append({"estimator": "guided_equal_time", "budget_ms": ums,
                     "train_spp": train, "ms": gems, "rmse": r_gt_,
                     "rmse_ratio_vs_uniform": r_gt_ / r_u})
        print(rows[-1], flush=True)
        u_cap = max(4 * spp, int(2 * spp * gms / max(ums, 1)))
        ui2, uems, _, _ = solve_image(problem, UniformIntegrator,
                                      settings(u_cap),
                                      time_budget_s=gms / 1e3)
        r_u2 = rmse(ui2, gt)
        rows.append({"estimator": "uniform_equal_time", "budget_ms": gms,
                     "ms": uems, "rmse": r_u2,
                     "rmse_ratio_guided_vs_this": r_g / r_u2})
        print(rows[-1], flush=True)

    out = {"scene": "neumann3d", "res": res, "gt_spp": a.gt_spp,
           "rows": rows}
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
