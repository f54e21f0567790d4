#!/usr/bin/env python
"""Repro for the guided equal-time budget overshoot (BENCH_parity.json
`guided_equal_time`): a guided solve with spp=4x, train=64 squeezed into
uniform's wall budget.  Run with ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1
to see where the wall clock goes.

Usage: python tools/tpu_budget_repro.py [--res 256] [--budget 10.07]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

from elaina_tpu.exec import _apply_platform_env

_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--budget", type=float, default=10.07)
    ap.add_argument("--skip-warm", action="store_true")
    a = ap.parse_args()

    from bench import _build_ladybug_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from tools.tpu_parity import _respot_colors, solve_image

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

    problem = _respot_colors(_build_ladybug_problem(res, "grid"))

    if not a.skip_warm:
        # populate the problem's cost/rate caches the way the parity tool's
        # guided equal-spp run does before its equal-time row (256/64 —
        # the recorded rates scale with phase size, so warm with the same
        # shape the protocol does)
        _, ms, _, steps = solve_image(problem, GuidedIntegrator,
                                      settings(256, 64), net_conf)
        print(f"warm guided 256/64: {ms} ms, "
              f"{steps/(ms/1e3)/1e6:.1f}M steps/s", flush=True)

    os.environ["ELAINA_PHASE_DEBUG"] = "1"
    os.environ["ELAINA_BALANCE_DEBUG"] = "1"
    img, ms, wall, steps = solve_image(
        problem, GuidedIntegrator, settings(4 * 256, 64), net_conf,
        time_budget_s=a.budget)
    print(f"equal-time guided: ms={ms} wall={wall:.2f}s budget={a.budget}s "
          f"steps={int(steps)}", flush=True)


if __name__ == "__main__":
    main()
