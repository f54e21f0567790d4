#!/usr/bin/env python
"""Headline benchmark: guided WoSt walk throughput on the ladybug scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = executed walk-steps per second per chip (live lanes summed over
depth / solve wall time, steady state).  Baseline target: 1e7
walk-steps/sec/chip (BASELINE.md north star; the reference repo publishes
no numbers of its own — BASELINE.md "Published reference numbers: None").

Usage: python bench.py [--quick] [--res N] [--spp N] [--scene ladybug|square]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compiled-program cache (jax is pre-imported in this
# environment, so the env var alone would be read too late)
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".cache", "jaxcache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

BASELINE_WALK_STEPS = 1e7


def _build_ladybug_problem(res: int, accel: str):
    import numpy as np
    from elaina_tpu.core.problem import Problem

    conf = {
        "aabb": {"min": [-100.0, -100.0], "max": [600.0, 600.0]},
        "evaluation_grid": {"mData": {"pos": [250.0, 250.0], "scale": 250,
                                      "up": [-1.0, 0.0]}},
        "mesh": {
            "dirichlet_path": "/root/reference/data/ladybug/model.obj",
            "vertex_color_dirichlet_path":
                os.path.join(os.path.dirname(__file__),
                             "configs/data/ladybug_colors.npz"),
            "neumann_path": "/root/reference/data/ladybug/boundary.obj",
        },
    }
    return Problem(2, verbose=False).load_config(
        conf, cache_dir=os.path.join(os.path.dirname(__file__), ".cache"),
        accel=accel)


def _build_square_problem(res: int, accel: str):
    """Synthetic fallback scene when the reference data is unavailable."""
    import numpy as np
    from elaina_tpu.core.problem import Boundary, Problem, Scene
    from elaina_tpu.core.evaluation_grid import EvaluationGrid
    from elaina_tpu.geometry.geomset import make_geom_set

    t = np.linspace(0, 2 * np.pi, 2049)[:-1]
    r = 200 + 50 * np.sin(9 * t)
    verts = (np.stack([r * np.cos(t), r * np.sin(t)], -1) + 250).astype(np.float32)
    idx = np.stack([np.arange(2048), (np.arange(2048) + 1) % 2048], -1).astype(np.int32)
    gs, depth = make_geom_set(verts, idx)
    colors = np.random.default_rng(0).uniform(0, 1, (len(verts), 2, 3)).astype(np.float32)

    p = Problem(2, verbose=False)
    p.scene = Scene(
        dirichlet=Boundary(gs=gs, colors=colors), neumann=None, d_grid=None,
        source=None, aabb_lo=np.float32([-100, -100]),
        aabb_hi=np.float32([600, 600]), dim=2, source_intensity=1.0,
        dirichlet_intensity=1.0, neumann_intensity=1.0)
    p.d_stack = depth + 4
    p.probe = EvaluationGrid.from_json(
        {"mData": {"pos": [250.0, 250.0], "scale": 250, "up": [-1.0, 0.0]}}, 2)
    return p


def _build_conf_problem(conf_name: str, accel: str, dim: int = 3):
    from elaina_tpu.core.problem import Problem

    conf = json.load(open(os.path.join(os.path.dirname(__file__),
                                       "configs", conf_name)))["scene"]
    return Problem(dim, verbose=False).load_config(
        conf, cache_dir=os.path.join(os.path.dirname(__file__), ".cache"),
        accel=accel)


def _build_bumpy3d_problem(accel: str):
    """3D variant: deformed icosphere, harmonic Dirichlet BC
    (tools/make_scene3d.py; exact analytic interior solution)."""
    return _build_conf_problem("bumpy3d_u.json", accel)


def main() -> int:
    # honor JAX_PLATFORMS at runtime: jax is pre-imported (sitecustomize)
    # and a PJRT plugin may hook backend resolution, so the env var alone
    # is read too late — and with the TPU tunnel down, initializing the
    # plugin's backend retries forever instead of failing over.  Done in
    # main(), NOT at import: library importers (tools/tpu_parity, tests,
    # ad-hoc probes) pick their own platform via jax.config.update.
    from elaina_tpu.exec import _apply_platform_env
    _apply_platform_env()

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small CPU-friendly run")
    ap.add_argument("--res", type=int, default=0)
    ap.add_argument("--spp", type=int, default=0)
    ap.add_argument("--train-spp", type=int, default=0)
    ap.add_argument("--scene", default="ladybug")
    ap.add_argument("--time-budget", type=float, default=0.0,
                    help="soft solve-time cap (s); 0 = none (the declared "
                         "protocol runs in full — a budget reroutes "
                         "training through the budgeted ~32-spp-target "
                         "path and the headline stops being "
                         "apples-to-apples across rounds; the SIGALRM "
                         "watchdog still guards hangs)")
    args = ap.parse_args()

    # hard watchdog: if the device wedges we still emit a parsable line
    # (or fall back to a CPU run so the driver gets a real measurement)
    import signal

    def _die(signum, frame):
        if os.environ.get("ELAINA_BENCH_FALLBACK") != "1":
            os.environ["ELAINA_BENCH_FALLBACK"] = "1"
            os.environ["JAX_PLATFORM_NAME"] = "cpu"
            os.environ["JAX_PLATFORMS"] = "cpu"
            sys.stderr.write("bench: device wedged; re-exec on CPU\n")
            os.execv(sys.executable,
                     [sys.executable, os.path.abspath(__file__), "--quick"])
        print(json.dumps({
            "metric": "guided_wost_walk_steps_per_sec_per_chip",
            "value": 0.0, "unit": "walk-steps/s/chip", "vs_baseline": 0.0,
            "detail": {"error": "watchdog timeout (device hang?)"}}),
            flush=True)
        os._exit(3)

    signal.signal(signal.SIGALRM, _die)

    # pre-flight 1 (subprocess, hard-bounded): with the TPU tunnel down the
    # axon plugin's backend init retries forever inside C code, where a
    # SIGALRM Python handler never runs — so probe init in a child process
    # that an OS timeout CAN kill, and fall back to CPU if it dies.
    # Generous deadline: the tunneled chip takes minutes (sometimes >10)
    # to come back after a previous heavy process was killed mid-dispatch.
    if (os.environ.get("ELAINA_BENCH_FALLBACK") != "1"
            and os.environ.get("JAX_PLATFORMS", "") != "cpu"):
        import subprocess
        alive = False
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "jnp.ones((8, 8)).sum().block_until_ready(); "
                 "print(jax.default_backend())"],
                capture_output=True, text=True,
                timeout=float(os.environ.get("ELAINA_PROBE_TIMEOUT", 600)))
            alive = probe.returncode == 0
        except subprocess.TimeoutExpired:
            pass
        if not alive:
            os.environ["ELAINA_BENCH_FALLBACK"] = "1"
            os.environ["JAX_PLATFORM_NAME"] = "cpu"
            os.environ["JAX_PLATFORMS"] = "cpu"
            sys.stderr.write("bench: backend probe failed; re-exec on CPU\n")
            os.execv(sys.executable,
                     [sys.executable, os.path.abspath(__file__), "--quick"])

    # pre-flight 2 (in-process): a tiny computation must complete or the
    # device is wedged.
    import jax.numpy as jnp
    signal.alarm(900)
    _ = float(jnp.ones((8, 8)).sum())
    signal.alarm(int(args.time_budget * 2 + 600) if args.time_budget
                 else 2400)

    import jax

    backend = jax.default_backend()
    quick = args.quick or backend == "cpu"
    # production-shaped workload: the reference protocol runs 1024 spp with
    # a 4:1 solve:train split (data/ladybug/n.json); 256 spp keeps the same
    # ratio while fitting the bench time budget, and amortizes the ~20s of
    # fixed per-process costs (executable loads, tunnel transfers) that
    # dominate shorter runs
    res = args.res or (64 if quick else 512)
    spp = args.spp or (4 if quick else 256)
    train_spp = args.train_spp or (2 if quick else 64)
    accel = "bvh" if backend == "cpu" else "grid"

    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator

    eps = 1.0
    if args.scene == "bumpy3d":
        problem = _build_bumpy3d_problem(accel)
        eps = 0.01
    elif args.scene == "neumann3d":
        # Neumann-heavy mixed-BC scene: 768-tri Dirichlet cube + 20,480-tri
        # insulated blob — exercises the hierarchical silhouette / in-ball
        # / ray paths at a primitive count where dense sweeps are
        # infeasible (VERDICT r2 next #5)
        problem = _build_conf_problem("neumann3d_u.json", accel)
        eps = 0.01
    elif args.scene == "ladybug" and os.path.exists(
            "/root/reference/data/ladybug/model.obj"):
        problem = _build_ladybug_problem(res, accel)
    else:
        problem = _build_square_problem(res, accel)

    settings = IntegratorSettings(
        frameSize=(res, res), samplesPerPixel=spp, maxWalkingDepth=64,
        epsilonShell=eps, trainSppCount=train_spp,
        uniformFractionInTrainingPhase=0.5, uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=10, maxGuidedDepthInGuidingPhase=10)

    out_dir = os.path.join(os.path.dirname(__file__), "exp", "bench")
    os.makedirs(out_dir, exist_ok=True)

    net_conf = {
        "encoding": {"otype": "DenseGrid", "base_resolution": 8, "n_levels": 8,
                     "n_features_per_level": 4, "per_level_scale": 1.405},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 3, "activation": "ReLU"},
        "optimizer": {"otype": "Ema", "decay": 0.95,
                      "nested": {"otype": "Adam", "learning_rate": 8e-3,
                                 "beta1": 0.9, "beta2": 0.99,
                                 "epsilon": 1e-15, "l2_reg": 1e-6}},
    }

    integ = GuidedIntegrator(problem, settings, out_dir)
    integ.reset_network(net_conf)

    if os.environ.get("ELAINA_BENCH_WARMUP") != "0":
        # AOT step: trace + compile the persistent-phase programs before
        # the timed solve (the reference's CUDA kernels are compiled at
        # build time, so its durations cover only walking; XLA compiles at
        # first call).  prepare() runs the chunks once with zero quota —
        # identical shapes, so solve() reuses the executables.
        import time as _time
        t_w = _time.time()
        integ.prepare()
        sys.stderr.write(f"bench: prepare (AOT compile) "
                         f"{_time.time()-t_w:.1f}s\n")

    duration_ms = integ.solve(time_budget_s=args.time_budget or None)
    steps = integ.total_walk_steps
    value = steps / max(duration_ms / 1000.0, 1e-9)

    print(json.dumps({
        "metric": "guided_wost_walk_steps_per_sec_per_chip",
        "value": value,
        "unit": "walk-steps/s/chip",
        "vs_baseline": value / BASELINE_WALK_STEPS,
        "detail": {"backend": backend, "scene": args.scene, "res": res,
                   "spp": spp, "train_spp": train_spp,
                   "train_spp_achieved":
                       getattr(integ, "train_spp_achieved", None),
                   "time_budget_s": args.time_budget or None,
                   "walk_steps": int(steps), "duration_ms": duration_ms,
                   "phases": getattr(integ, "phase_stats", None)},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
