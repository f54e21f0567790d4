#!/usr/bin/env python
"""Timing repro for the 256-budget guided_equal_time wall gap (round 5).

Symptom (r5b parity): budget 10.36s, training phase 2.11s, guiding
phase NEVER entered (guide_s 0.0), total 12.8s — ~8.5s of wall
unaccounted between solve() entry and the training phase's own timer.
Runs the same solve with ELAINA_PHASE_DEBUG=1 so the _mark/_m tags
bracket every prefix step.

Usage: python tools/tpu_eqtime_guided_repro.py [--res 256] [--budget 10.4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
os.environ["ELAINA_PHASE_DEBUG"] = "1"
os.environ["ELAINA_BALANCE_DEBUG"] = "1"
import jax

from elaina_tpu.exec import _apply_platform_env

_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--budget", type=float, default=10.4)
    a = ap.parse_args()

    from bench import _build_ladybug_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from tools.tpu_parity import _respot_colors

    res = a.res
    problem = _respot_colors(_build_ladybug_problem(res, "grid"))
    settings = IntegratorSettings(
        frameSize=(res, res), samplesPerPixel=1024, maxWalkingDepth=64,
        epsilonShell=1.0, trainSppCount=64,
        uniformFractionInTrainingPhase=0.5,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=10, maxGuidedDepthInGuidingPhase=10)
    net = {
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
    integ = GuidedIntegrator(problem, settings, "/tmp/eqrepro")
    integ.reset_network(net)
    t_p = time.time()
    integ.prepare()
    print(f"prepare {time.time()-t_p:.1f}s", flush=True)
    ms = integ.solve(time_budget_s=a.budget)
    print(f"solve ms={ms} budget={a.budget*1000:.0f} "
          f"phases={integ.phase_stats}", flush=True)


if __name__ == "__main__":
    main()
