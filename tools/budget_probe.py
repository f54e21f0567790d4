#!/usr/bin/env python
"""Probe the time-budgeted solve paths: run uniform (to seed the problem's
cost/rate caches), then a budgeted guided solve, and report budget adherence
and phase split.

Usage: python tools/budget_probe.py [--res 128] [--budget 20]
       [--platform cpu|axon]  (default: honor JAX_PLATFORMS)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

from elaina_tpu.exec import _apply_platform_env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--budget", type=float, default=20.0)
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--train-spp", type=int, default=64)
    ap.add_argument("--platform", default=None)
    a = ap.parse_args()

    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    else:
        _apply_platform_env()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from bench import _build_ladybug_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from elaina_tpu.solver.integrator import UniformIntegrator

    res = a.res
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
    problem = _build_ladybug_problem(res, "grid")

    ust = IntegratorSettings(frameSize=(res, res), samplesPerPixel=4,
                             maxWalkingDepth=64, epsilonShell=1.0)
    ui = UniformIntegrator(problem, ust, "/tmp/budget_probe_u")
    ui.prepare()
    ums = ui.solve()
    print(f"uniform prior: {ums} ms; caches: "
          f"cost={list(problem.__dict__.get('_cost_cache', {}))} "
          f"rate={problem.__dict__.get('_rate_cache')}", flush=True)

    settings = IntegratorSettings(
        frameSize=(res, res), samplesPerPixel=a.spp, maxWalkingDepth=64,
        epsilonShell=1.0, trainSppCount=a.train_spp,
        uniformFractionInTrainingPhase=0.5,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=10, maxGuidedDepthInGuidingPhase=10)
    integ = GuidedIntegrator(problem, settings, "/tmp/budget_probe_g")
    integ.reset_network(net_conf)
    integ.prepare()

    t0 = time.time()
    ms = integ.solve(time_budget_s=a.budget)
    wall = time.time() - t0
    over = wall / a.budget
    print(f"budget={a.budget}s solve ms={ms} wall={wall:.1f}s "
          f"({over:.2f}x budget) phases={integ.phase_stats} "
          f"steps={integ.total_walk_steps}", flush=True)
    return 0 if over < 1.5 else 1


if __name__ == "__main__":
    raise SystemExit(main())
