#!/usr/bin/env python
"""Multi-seed equal-spp parity study under pinned round structure.

VERDICT r4 #1: characterize the guided-quality spread that round 4
attributed to "training-seed variance" without ever running two
identical configurations.  This tool pins the round structure
(ELAINA_DETERMINISTIC=1: no disk hints, no timing-fed iteration caps)
and sweeps ELAINA_SEED, so the remaining spread IS seed spread — any
residual difference between two seed-0 runs would be a determinism bug
(checked by --repeat0).

Protocol per seed: uniform <spp> + guided <spp>/<spp//4> against one
shared uniform GT, reporting RMSE and the equal-spp ratio; writes
mean +/- std per budget.

Usage: python tools/tpu_variance.py [--res 256] [--gt-spp 2048]
       [--budgets 256,64] [--seeds 0,1,2,3,4] [--scene spot]
       [--out BENCH_variance.json] [--repeat0]
"""
import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
os.environ["ELAINA_DETERMINISTIC"] = "1"
import jax

from elaina_tpu.exec import _apply_platform_env

_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--gt-spp", type=int, default=2048)
    ap.add_argument("--budgets", default="256,64")
    ap.add_argument("--seeds", default="0,1,2,3,4")
    ap.add_argument("--scene", default="spot")
    ap.add_argument("--repeat0", action="store_true",
                    help="run seed 0 twice and require bit-identical images")
    ap.add_argument("--out", default="/root/repo/BENCH_variance.json")
    a = ap.parse_args()

    from tools.tpu_parity import _respot_colors, solve_image
    from bench import _build_ladybug_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from elaina_tpu.solver.integrator import UniformIntegrator
    from tools.rmse import rmse

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
    res = a.res

    def settings(spp, train=0):
        return IntegratorSettings(
            frameSize=(res, res), samplesPerPixel=spp, maxWalkingDepth=64,
            epsilonShell=1.0, trainSppCount=train,
            uniformFractionInTrainingPhase=0.5,
            uniformFractionInGuidingPhase=0.5,
            maxGuidedDepthInTrainingPhase=10,
            maxGuidedDepthInGuidingPhase=10)

    problem = _build_ladybug_problem(res, "grid")
    if a.scene == "spot":
        problem = _respot_colors(problem)
    print(f"scene={a.scene} res={res} deterministic=1", flush=True)

    os.environ["ELAINA_SEED"] = "0"
    gt, ms, _, _ = solve_image(problem, UniformIntegrator, settings(a.gt_spp))
    print(f"GT uniform {a.gt_spp} spp: {ms:.0f} ms", flush=True)

    budgets = [int(s) for s in a.budgets.split(",")]
    seeds = [int(s) for s in a.seeds.split(",")]
    rows = []
    per_budget = {b: [] for b in budgets}
    seed_list = seeds + ([0] if a.repeat0 else [])
    img0 = {}
    for run_i, seed in enumerate(seed_list):
        os.environ["ELAINA_SEED"] = str(seed)
        for spp in budgets:
            ui, ums, _, _ = solve_image(problem, UniformIntegrator,
                                        settings(spp))
            r_u = rmse(ui, gt)
            train = max(4, spp // 4)
            gi, gms, _, _ = solve_image(problem, GuidedIntegrator,
                                        settings(spp, train), net_conf)
            r_g = rmse(gi, gt)
            row = {"seed": seed, "spp": spp, "train_spp": train,
                   "rmse_uniform": r_u, "rmse_guided": r_g,
                   "ratio": r_g / r_u, "ms_uniform": ums, "ms_guided": gms}
            if run_i < len(seeds):
                per_budget[spp].append(r_g / r_u)
            rows.append(row)
            print(row, flush=True)
            h = hashlib.sha1(np.asarray(gi).tobytes()).hexdigest()[:16]
            if seed == 0 and spp in img0:
                same = img0[spp] == h
                rows.append({"repeat0_spp": spp, "bit_identical": bool(same)})
                print(f"repeat0 spp={spp}: bit_identical={same} ({h})",
                      flush=True)
            img0.setdefault(spp, h)

    summary = {}
    for b in budgets:
        v = np.array(per_budget[b])
        summary[str(b)] = {"n": len(v), "mean": float(v.mean()),
                           "std": float(v.std(ddof=1)) if len(v) > 1 else 0.0,
                           "min": float(v.min()), "max": float(v.max())}
        print(f"equal-spp ratio @ {b} spp: mean {v.mean():.3f} "
              f"+/- {v.std(ddof=1) if len(v) > 1 else 0:.3f} "
              f"(range {v.min():.3f}-{v.max():.3f}, n={len(v)})", flush=True)

    out = {"scene": a.scene, "res": res, "gt_spp": a.gt_spp,
           "deterministic": True, "rows": rows, "summary": summary}
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
