#!/usr/bin/env python
"""Equal-spp / equal-time RMSE parity: guided vs uniform on ladybug (TPU).

Reproduces the reference's convergence protocol (BASELINE.md): a high-spp
uniform ground truth, then uniform and guided solves at matched sample
budgets.  Prints a JSON table and writes it to BENCH_parity.json.

Usage: python tools/tpu_parity.py [--res 256] [--gt-spp 2048]
       [--budgets 256,64] [--scene ladybug|lsource]
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

# honor JAX_PLATFORMS at runtime (jax may be pre-imported / plugin-overridden
# before this process's environment is consulted)
_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np


def _respot_colors(problem, center_frac=0.35, width_frac=0.01, value=20.0):
    """Replace the Dirichlet colors with a mostly-dark boundary and one
    small bright arc — the high-directional-contrast regime the guiding
    method targets (localized contribution; uniform direction sampling
    wastes almost every walk).  Rebuilds the color tables the fast path
    bakes (attach_shading crows)."""
    import dataclasses

    import jax.numpy as jnp

    from elaina_tpu.core.problem import Boundary
    from elaina_tpu.geometry.grid import attach_shading

    gs = problem.scene.dirichlet.gs
    V = gs.verts.shape[0]
    # bright window by vertex index: boundary curves are index-ordered, so
    # a contiguous id range is a contiguous arc
    lo = int(center_frac * V)
    hi = lo + max(4, int(width_frac * V))
    colors = np.zeros((V, 2, 3), np.float32)
    colors[lo:hi, :, :] = value
    g = problem.scene.d_grid
    if g is not None and g.crows is not None:
        g = dataclasses.replace(g, cpack=None, crows=None)
        g = attach_shading(g, colors, np.asarray(gs.indices))
    problem.scene = dataclasses.replace(
        problem.scene,
        dirichlet=Boundary(gs=gs, colors=jnp.asarray(colors)),
        d_grid=g)
    return problem


def solve_image(problem, integrator_cls, settings, net_conf=None,
                time_budget_s=None):
    out_dir = "/tmp/parity"
    os.makedirs(out_dir, exist_ok=True)
    integ = integrator_cls(problem, settings, out_dir)
    if net_conf is not None:
        integ.reset_network(net_conf)
    if hasattr(integ, "prepare"):
        integ.prepare()  # AOT compile so ms measures walking, not XLA
    t0 = time.time()
    if time_budget_s is not None:
        ms = integ.solve(time_budget_s=time_budget_s)
    else:
        ms = integ.solve()
    wall = time.time() - t0
    img = integ.films["SOLUTION"].pixels()
    steps = getattr(integ, "total_walk_steps", 0)
    ph = getattr(integ, "phase_stats", None)
    if ph:
        print(f"  phases: {ph}", flush=True)
    return img, ms, wall, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--gt-spp", type=int, default=2048)
    ap.add_argument("--budgets", default="256,64")
    ap.add_argument("--scene", default="ladybug")
    ap.add_argument("--equal-time", action="store_true")
    ap.add_argument("--out", default="/root/repo/BENCH_parity.json",
                    help="output JSON path (point ad-hoc runs elsewhere so "
                         "they don't clobber the recorded TPU rows)")
    a = ap.parse_args()

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
    elif a.scene == "lsource":
        import dataclasses

        from elaina_tpu.core.problem import _load_source
        src = _load_source("/root/repo/configs/data/ladybug_source.nvdb", 2)
        problem.scene = dataclasses.replace(
            problem.scene, source=src,
            source_intensity=float(os.environ.get("ELAINA_SRC_INT", "1.0")))
    print(f"scene={a.scene} res={res}", flush=True)

    gt, ms, _, _ = solve_image(problem, UniformIntegrator,
                               settings(a.gt_spp))
    print(f"GT uniform {a.gt_spp} spp: {ms:.0f} ms", flush=True)

    rows = []
    for spp in [int(s) for s in a.budgets.split(",")]:
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
        rows.append({"estimator": "guided", "spp": spp,
                     "train_spp": train, "rmse": r_g, "ms": gms,
                     "steps_per_s": gsteps / (gms / 1e3),
                     "rmse_ratio_vs_uniform": r_g / r_u,
                     "time_ratio_vs_uniform": gms / ums})
        print(rows[-1], flush=True)

        if a.equal_time:
            # equal-WALL-CLOCK, both directions:
            # (a) guided squeezed into uniform's budget (training spp
            #     included — the budget slicer adapts both phases)
            gi, gems, _, _ = solve_image(
                problem, GuidedIntegrator, settings(4 * spp, train),
                net_conf, time_budget_s=ums / 1e3)
            r_gt_ = rmse(gi, gt)
            rows.append({"estimator": "guided_equal_time", "budget_ms": ums,
                         "train_spp": train, "ms": gems, "rmse": r_gt_,
                         "rmse_ratio_vs_uniform": r_gt_ / r_u})
            print(rows[-1], flush=True)
            # (b) uniform extended to guided's wall-clock (the paper's
            #     equal-time protocol: same wall budget for both).  The
            #     spp ceiling scales with the measured wall ratio so the
            #     budget — not the sample count — is what stops the run.
            u_cap = max(4 * spp, int(2 * spp * gms / max(ums, 1)))
            ui2, uems, _, _ = solve_image(
                problem, UniformIntegrator, settings(u_cap),
                time_budget_s=gms / 1e3)
            r_u2 = rmse(ui2, gt)
            rows.append({"estimator": "uniform_equal_time",
                         "budget_ms": gms, "ms": uems, "rmse": r_u2,
                         "rmse_ratio_guided_vs_this": r_g / r_u2})
            print(rows[-1], flush=True)

    out = {"scene": a.scene, "res": res, "gt_spp": a.gt_spp, "rows": rows}
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
