"""Experiment runner: config JSON -> problem -> integrator -> exports.

Parity with exec.cu:39-221 (run_expr): copies the config next to the
outputs, dispatches the integrator variant, runs the requested channels,
performs the export list, and writes ``result.json`` with the solve
duration and a timestamp.
"""

from __future__ import annotations

import datetime
import json
import os

from .core.config import ExperimentConfig
from .core.logger import log_error, log_info, log_success
from .core.problem import Problem
# Integrator imports stay INSIDE run_expr: importing the solver stack pulls
# module-level jnp constants, which would initialize the default backend
# before _apply_platform_env can re-assert the requested platform.


def _cache_dir() -> str:
    """Shared on-disk cache (candidate grids + XLA executables), overridable
    with ELAINA_CACHE_DIR.  Keyed caches make it safe to share across
    experiments; the reference rebuilds its LBVH per run instead."""
    d = os.environ.get("ELAINA_CACHE_DIR",
                       os.path.expanduser("~/.cache/elaina_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _enable_compilation_cache(cache_root: str) -> None:
    """Persist XLA executables across processes: the tunneled-TPU remote
    compile costs minutes on a cold start, dwarfing the actual solve for
    small runs."""
    import jax

    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache_root, "jaxcache"))


def _apply_platform_env() -> None:
    """Honor JAX_PLATFORMS at runtime: some deployments pre-import jax
    (sitecustomize) before the user's environment can influence its
    import-time snapshot, or install plugins that override it — re-assert
    the requested platform before the first device op."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backend already initialized; keep it


def run_expr(conf_path: str) -> dict:
    _apply_platform_env()
    conf_path = os.path.abspath(conf_path)
    if not os.path.exists(conf_path):
        log_error("Configuration file does not exist: %s", conf_path)
        return {}

    cfg = ExperimentConfig.from_file(conf_path)
    base_dir = os.getcwd()
    out_dir = os.path.join(cfg.base_path, cfg.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    with open(conf_path) as f:
        raw_conf = json.load(f)
    with open(os.path.join(out_dir, "conf.json"), "w") as f:
        json.dump(raw_conf, f, indent=4)
    log_success("Configuration file copied to %s", os.path.join(out_dir, "conf.json"))

    cache_root = _cache_dir()
    _enable_compilation_cache(cache_root)
    from .models import CHANNELS, GuidedIntegrator, UniformIntegrator

    problem = Problem(cfg.dimensionality).load_config(
        cfg.scene, base_dir=base_dir, cache_dir=cache_root)

    if cfg.integrator_type == "uniform":
        integrator = UniformIntegrator(problem, cfg.settings, out_dir)
    elif cfg.integrator_type == "guided":
        integrator = GuidedIntegrator(problem, cfg.settings, out_dir)
        integrator.reset_network(cfg.network)
    else:
        raise ValueError(f"Unrecognized integrator type: {cfg.integrator_type!r}")

    # ELAINA_DEVICES=N shards the persistent-solve lane axis over the
    # first N local devices (extension; the reference is single-GPU)
    try:
        n_dev = int(os.environ.get("ELAINA_DEVICES") or "1")
    except ValueError:
        log_error("ELAINA_DEVICES=%r is not an integer; running "
                  "single-device", os.environ.get("ELAINA_DEVICES"))
        n_dev = 1
    if n_dev > 1:
        import jax

        from .parallel.dp import make_mesh
        avail = len(jax.devices())
        if avail < n_dev:
            log_error("ELAINA_DEVICES=%d but only %d device(s) available; "
                      "running single-device", n_dev, avail)
        elif integrator.n_pixels % n_dev != 0:
            log_error("frame has %d lanes, not divisible by "
                      "ELAINA_DEVICES=%d; running single-device",
                      integrator.n_pixels, n_dev)
        else:
            integrator.mesh = make_mesh(n_dev)
            log_success("Sharding lanes over %d devices", n_dev)

    if os.environ.get("ELAINA_PREPARE") == "1" and hasattr(
            integrator, "prepare"):
        # AOT-compile the persistent programs so result.json's duration
        # measures walking, like the reference's build-time-compiled CUDA
        # kernels (bench.py does the same; opt-in here because the first
        # remote compile can take minutes and most CLI runs prefer
        # fastest-to-first-pixel)
        import time as _time
        t_p = _time.time()
        integrator.prepare()
        log_info("prepare (AOT compile): %.1fs", _time.time() - t_p)

    result: dict = {}
    for channel in sorted(set(cfg.channels), key=lambda c: CHANNELS.index(c)):
        if channel == "SOLUTION":
            result["duration"] = integrator.solve()
        elif channel == "DIRICHLET_SDF":
            integrator.render_dirichlet_sdf()
        elif channel == "NEUMANN_SDF":
            integrator.render_silhouette_sdf()
        elif channel == "SOURCE":
            integrator.render_source()
        else:
            log_error("Unrecognized integrator channel %r, skipping...", channel)

    if cfg.print_network:
        import numpy as np
        p = (np.array([0.0, -0.21, 0.0], np.float32) if cfg.dimensionality == 3
             else np.zeros(2, np.float32))
        integrator.query_network(p)

    for e in cfg.exports:
        if e.channel not in CHANNELS:
            log_error("Unrecognized export channel %r, skipping...", e.channel)
            continue
        if e.type == "image":
            integrator.export_image(e.channel, e.file_name)
        elif e.type == "energy":
            integrator.export_energy(e.channel, e.tone, e.file_name)

    # observability: the reference collects a lossGraph it never writes out
    # (guided/integrator.cu:38-42); export it, plus the per-phase time and
    # walk-step breakdown the balanced solver tracks
    loss_hist = getattr(integrator, "loss_history", None)
    if loss_hist:
        result["loss_history"] = [float(v) for v in loss_hist]
    phase_stats = getattr(integrator, "phase_stats", None)
    if phase_stats:
        result["phase_stats"] = phase_stats
    steps = getattr(integrator, "total_walk_steps", None)
    if steps:
        result["walk_steps"] = int(steps)

    result["timestamp"] = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(out_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=4)
    log_success("Result file written to %s", os.path.join(out_dir, "result.json"))
    return result
