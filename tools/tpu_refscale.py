#!/usr/bin/env python
"""Reference-workload-scale row (VERDICT r2 weak #6): ladybug at 1024²,
the reference's frame size (data/ladybug/u.json: 1024² x 1024 spp,
depth 64).  Runs uniform 1024² x 32 spp (the BASELINE.md round-1 row's
protocol, for comparability) and guided 1024² x 64 spp (16 train).

Usage: python tools/tpu_refscale.py [--spp 32]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--guided-spp", type=int, default=64)
    a = ap.parse_args()

    from bench import _build_ladybug_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from elaina_tpu.solver.integrator import UniformIntegrator

    res = 1024
    problem = _build_ladybug_problem(res, "grid")

    def run(cls, spp, train=0, net=None):
        st = IntegratorSettings(
            frameSize=(res, res), samplesPerPixel=spp, maxWalkingDepth=64,
            epsilonShell=1.0, trainSppCount=train,
            uniformFractionInTrainingPhase=0.5,
            uniformFractionInGuidingPhase=0.5,
            maxGuidedDepthInTrainingPhase=10,
            maxGuidedDepthInGuidingPhase=10)
        integ = cls(problem, st, "/tmp/refscale")
        if net is not None:
            integ.reset_network(net)
        t_p = time.time()
        if hasattr(integ, "prepare"):
            integ.prepare()
        prep = time.time() - t_p
        ms = integ.solve()
        steps = int(integ.total_walk_steps)
        row = {"estimator": cls.__name__, "res": res, "spp": spp,
               "train_spp": train, "ms": ms, "prepare_s": round(prep, 1),
               "steps": steps,
               "steps_per_s": steps / max(ms / 1e3, 1e-9)}
        print(json.dumps(row), flush=True)
        return row

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
    if a.spp > 0:
        run(UniformIntegrator, a.spp)
    if a.guided_spp > 0:
        run(GuidedIntegrator, a.guided_spp, max(a.guided_spp // 4, 1),
            net_conf)


if __name__ == "__main__":
    main()
