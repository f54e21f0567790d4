#!/usr/bin/env python
"""Repro for the regressed `uniform_equal_time` parity row: a 1024-spp
uniform solve cut by a wall budget completed ~346 spp on average in the
r3c run yet measured RMSE 0.153 (worse than the 256-spp plain run's
0.109 in LESS wall) — the per-pixel completion skew theory says the
budgeted rounds finish some pixels fully and leave others nearly empty,
so the rescaled image's effective (harmonic-mean) spp collapses.

Runs plain uniform 256 (seeds the cost/rate hints exactly like the
parity tool), then budgeted uniform 1024 with ELAINA_DONE_DUMP set, and
prints the completion histogram: arithmetic vs harmonic mean spp.

Usage: python tools/tpu_eqtime_repro.py [--res 256]
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    a = ap.parse_args()

    from bench import _build_ladybug_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.integrator import UniformIntegrator
    from tools.tpu_parity import _respot_colors, solve_image

    res = a.res

    def settings(spp):
        return IntegratorSettings(
            frameSize=(res, res), samplesPerPixel=spp, maxWalkingDepth=64,
            epsilonShell=1.0)

    problem = _respot_colors(_build_ladybug_problem(res, "grid"))

    _, ums, _, usteps = solve_image(problem, UniformIntegrator,
                                    settings(256))
    print(f"plain uniform 256: {ums:.0f} ms, "
          f"{usteps / (ums / 1e3) / 1e6:.1f}M steps/s", flush=True)

    os.environ["ELAINA_BALANCE_DEBUG"] = "1"
    os.environ["ELAINA_DONE_DUMP"] = "/tmp/eqtime_done.npy"
    _, bms, _, bsteps = solve_image(problem, UniformIntegrator,
                                    settings(1024), time_budget_s=ums / 1e3)
    print(f"budgeted uniform 1024 @ {ums:.0f} ms: ran {bms:.0f} ms, "
          f"{bsteps / (bms / 1e3) / 1e6:.1f}M steps/s", flush=True)

    done = np.load("/tmp/eqtime_done.npy")
    d = done[done >= 0].astype(np.float64)  # -1 = resolved (analytic)
    amean = d.mean()
    hmean = d.size / np.maximum(1.0 / np.maximum(d, 0.25), 0).sum()
    qs = np.percentile(d, [0, 1, 5, 25, 50, 75, 95, 99, 100])
    print(f"completion spp over {d.size} unresolved px: "
          f"arith-mean {amean:.1f}, harmonic-mean {hmean:.1f}")
    print("percentiles [0,1,5,25,50,75,95,99,100]:",
          np.round(qs, 1).tolist())
    print(f"zero-sample pixels: {(d == 0).sum()}")


if __name__ == "__main__":
    main()
