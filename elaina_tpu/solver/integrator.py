"""Integrator drivers: solve loop, auxiliary channels, exports.

Uniform driver parity: UniformIntegrator<DIM> (integrator/uniform/
integrator.{h,cu}) — solve() with per-spp/per-time frame dumps
(integrator.cu:578-609), renderDirichletSDF / renderSilhouetteSDF /
renderSource one-shot channels (integrator/common.h:51-163), and
exportImage / exportEnergy (common.h:165-240).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import IntegratorSettings
from ..core.evaluation_grid import EvaluationGrid
from ..core.logger import log_info
from ..core.problem import Problem
from ..geometry import queries as Q
from ..output.film import Film
from .wost import dirichlet_distance, run_one_sample

# ExportImageChannel (core/common.h:235-241); index = Film slot
CHANNELS = ("DIRICHLET_SDF", "NEUMANN_SDF", "SOURCE", "SOLUTION")


def _progress(i, n, label="Solving"):
    if n <= 0:
        return
    width = 30
    done = int(width * (i / n))
    sys.stderr.write(f"\r{label}... [{'#' * done}{'.' * (width - done)}] {i}/{n}")
    if i == n:
        sys.stderr.write("\n")
    sys.stderr.flush()


class BaseIntegrator:
    # optional 1-D jax.sharding.Mesh: shards the persistent-solve LANE
    # axis across devices (each device drains its own worklist loop; see
    # wost.make_balanced_chunk).  Set BEFORE the first solve/prepare call
    # (the compiled chunks are memoized).  None = single device.
    mesh = None

    def __init__(self, problem: Problem, settings: IntegratorSettings,
                 base_path: str):
        self.problem = problem
        self.settings = settings
        self.base_path = base_path
        self.films = {c: Film(settings.frameSize) for c in CHANNELS}

        # bake the epsilon-shell need bit into the dense finest-level
        # lookup (grid.FinePack) — the integrator is the first place eps
        # is known.  Gated on the Pallas coords table (TPU fast path).
        scene = problem.scene
        if (scene is not None and scene.d_grid is not None
                and scene.d_grid.coords is not None):
            import dataclasses

            from ..geometry.grid import attach_fine
            g2 = attach_fine(scene.d_grid, float(settings.epsilonShell))
            if g2 is not scene.d_grid:
                problem.scene = dataclasses.replace(scene, d_grid=g2)

        # persistent load-balancing hints from earlier processes
        if hasattr(problem, "hint_cache_load"):
            problem.hint_cache_load()

        w, h = settings.frameSize
        self.n_pixels = w * h
        probe: EvaluationGrid = problem.probe
        pix = jnp.arange(self.n_pixels)
        self.eval_points = probe.points(pix, settings.frameSize)
        self.mask = jnp.asarray(self._frame_mask())

    def _frame_mask(self) -> np.ndarray:
        w, h = self.settings.frameSize
        m = self.problem.mask
        if m is None:
            return np.ones((w * h,), bool)
        if m.shape != (h, w):  # nearest-resize the mask image to the frame
            yi = (np.arange(h) * m.shape[0] // h)
            xi = (np.arange(w) * m.shape[1] // w)
            m = m[yi][:, xi]
        return m.reshape(-1)

    # ------------------------------------------------------------------ #
    # auxiliary channels (integrator/common.h:51-163)
    # ------------------------------------------------------------------ #

    def render_dirichlet_sdf(self):
        scene = self.problem.scene
        if scene.dirichlet is not None:
            d, _ = jax.jit(
                lambda sc, q: dirichlet_distance(sc, q, self.problem.d_stack)
            )(scene, self.eval_points)
            vals = np.asarray(d)
        else:
            vals = np.full((self.n_pixels,), np.inf, np.float32)
        film = self.films["DIRICHLET_SDF"]
        film.reset()
        film.put_frame(np.repeat(vals[:, None], 3, -1))

    def render_silhouette_sdf(self):
        scene = self.problem.scene
        if scene.neumann is not None:
            d = jax.jit(Q.closest_silhouette)(scene.neumann.gs,
                                              self.eval_points)
            vals = np.asarray(d)
        else:
            vals = np.full((self.n_pixels,), np.inf, np.float32)
        film = self.films["NEUMANN_SDF"]
        film.reset()
        film.put_frame(np.repeat(vals[:, None], 3, -1))

    def render_source(self):
        scene = self.problem.scene
        if scene.source is not None:
            vals = np.asarray(jax.jit(
                lambda src, q: src.sample(q))(scene.source, self.eval_points))
            vals = vals * scene.source_intensity
        else:
            vals = np.zeros((self.n_pixels, 3), np.float32)
        film = self.films["SOURCE"]
        film.reset()
        film.put_frame(vals)

    # ------------------------------------------------------------------ #
    # exports (integrator/common.h:165-240)
    # ------------------------------------------------------------------ #

    def export_image(self, channel: str, file_name: str):
        film = self.films[channel]
        for ext in (".exr", ".png"):
            path = os.path.join(self.base_path, file_name + ext)
            log_info("Exporting image to %s", path)
            film.save(path)

    def export_energy(self, channel: str, tone: str, file_name: str):
        film = self.films[channel]
        for ext in (".exr", ".png"):
            path = os.path.join(self.base_path, file_name + ext)
            log_info("Exporting energy to %s", path)
            film.save_energy(path, tone)

    def _dump_frames(self, solution_sum: np.ndarray, spp_done: int,
                     subdir: str, stem: str):
        film = self.films["SOLUTION"]
        film.reset()
        film.put_frame(solution_sum / max(spp_done, 1))
        base = os.path.join(self.base_path, subdir)
        film.save(os.path.join(base, stem + ".exr"))
        film.save(os.path.join(base, stem + ".png"))

    def query_network(self, p):
        raise NotImplementedError("uniform integrator has no guiding network")


class UniformIntegrator(BaseIntegrator):
    def solve(self, spp_chunk: int | None = None,
              time_budget_s: float | None = None) -> int:
        """Run the full spp loop; returns wall-clock milliseconds
        (UniformIntegrator::solve, integrator.cu:666-672).

        Default path: PERSISTENT LANES — each lane owns its pixel and runs
        its spp samples back-to-back, restarting the moment a walk dies, so
        the fixed-shape wavefront stays ~fully live (see
        wost.make_persistent_chunk).  Metric dumps (frames / frames_time)
        fall back to the per-sample path to keep the per-spp frame protocol
        exact; ``spp_chunk`` tunes that path's samples per dispatch.
        With ``time_budget_s``, rounds are time-sliced and an expiring
        budget degrades to a uniformly lower effective spp (see
        wost.balanced_solve).
        """
        s = self.settings
        scene = self.problem.scene
        from ..utils.rng import pkey
        key = pkey(0)

        metrics_on = s.saveSppMetricsDuration > 0 or s.saveTimeMetricsDuration > 0
        if not metrics_on and spp_chunk is None:
            return self._solve_persistent(time_budget_s)
        if spp_chunk is None:
            spp_chunk = 1 if metrics_on else min(4, s.samplesPerPixel)
        spp_chunk = max(1, min(spp_chunk, s.samplesPerPixel))
        if s.samplesPerPixel % spp_chunk != 0:
            spp_chunk = 1  # keep the sample count exact

        # NOTE: scene/eval points are jit *arguments* (device inputs), not
        # closure captures — captured constants are shipped inside the
        # compile payload, which breaks remote-compile setups for
        # accelerator-resident tables (HTTP 413 on axon).
        def chunk_fn(sc, pts, m, k):
            def body(carry, kk):
                acc, steps = carry
                c, st = run_one_sample(
                    sc, pts, m, kk,
                    eps=float(s.epsilonShell),
                    max_depth=int(s.maxWalkingDepth),
                    d_stack=self.problem.d_stack,
                    n_stack=self.problem.n_stack)
                return (acc + c, steps + st), None
            init = (jnp.zeros((self.n_pixels, 3), jnp.float32), jnp.int32(0))
            (acc, steps), _ = jax.lax.scan(
                body, init, jax.random.split(k, spp_chunk))
            return acc, steps

        jit_step = jax.jit(chunk_fn)
        step = lambda k: jit_step(scene, self.eval_points, self.mask, k)

        start = time.time()
        total = jnp.zeros((self.n_pixels, 3), jnp.float32)
        self.total_walk_steps = 0
        done = 0
        while done < s.samplesPerPixel:
            if (time_budget_s is not None and done > 0
                    and time.time() - start > time_budget_s):
                log_info("uniform solve interrupted at %d/%d spp (time "
                         "budget %.1fs)", done, s.samplesPerPixel,
                         time_budget_s)
                break
            contrib, steps = step(jax.random.fold_in(key, done))
            total = total + contrib
            self.total_walk_steps += int(steps)
            done += spp_chunk
            spp = done - 1
            if (s.saveSppMetricsDuration > 0
                    and spp % s.saveSppMetricsDuration == 0
                    and spp < s.saveSppMetricsUntil):
                self._dump_frames(np.asarray(total), done, "frames", str(spp))
            if s.saveTimeMetricsDuration > 0 and spp % s.saveTimeMetricsDuration == 0:
                elapsed_ms = int((time.time() - start) * 1000)
                self._dump_frames(np.asarray(total), done, "frames_time",
                                  str(elapsed_ms))
            _progress(done, s.samplesPerPixel)
        total.block_until_ready()
        duration_ms = int((time.time() - start) * 1000)

        film = self.films["SOLUTION"]
        film.reset()
        # normalize by the samples actually run (== samplesPerPixel unless
        # a time budget interrupted the loop)
        film.put_frame(np.asarray(total) / max(done, 1))
        return duration_ms

    def _chunk(self):
        """Memoized balanced chunk: re-creating the closure re-traces a
        very large while_loop program (~10s+ per solve)."""
        if getattr(self, "_uni_chunk", None) is None:
            from .wost import make_balanced_chunk

            s = self.settings
            self._uni_chunk = make_balanced_chunk(
                None, eps=float(s.epsilonShell),
                max_depth=int(s.maxWalkingDepth),
                d_stack=self.problem.d_stack, n_stack=self.problem.n_stack,
                mesh=self.mesh)
        return self._uni_chunk

    def _step0(self):
        if getattr(self, "_step0_cache", None) is None:
            from .wost import compute_step0

            s = self.settings
            f = jax.jit(lambda sc, p, m: compute_step0(
                sc, p, m, eps=float(s.epsilonShell),
                d_stack=self.problem.d_stack, n_stack=self.problem.n_stack))
            self._step0_cache = f(self.problem.scene, self.eval_points,
                                  self.mask)
        return self._step0_cache

    def prepare(self):
        """Trace + compile the persistent chunk before the timed solve
        (measured: a fresh process otherwise pays ~18s of trace + compile
        -cache load inside its first round — dominating small solves).
        Optional; ``solve()`` works without it."""
        from .wost import N_PIECES, _flush_jit

        scene = self.problem.scene
        n = self.n_pixels
        S = N_PIECES
        zf = jnp.zeros((S, n), jnp.float32)
        zi = jnp.zeros((S, n), jnp.int32)
        key = jax.random.PRNGKey(0)
        chunk = self._chunk()
        out = chunk(scene, None, (zf,) * scene.dim, zf, zi, key,
                    jnp.int32(0))
        jax.block_until_ready(out)
        from .wost import lane_cap, oversub_lanes

        m = self.mesh.devices.size if self.mesh else 1
        widths = {n}
        ov = lane_cap(oversub_lanes(n, int(self.settings.samplesPerPixel),
                                    m), m)
        widths.add(ov)
        if ov >= 4 * 32768:
            n4 = (ov // 4) // m * m
            if n4 > 0:
                widths.add(n4)
        for w in sorted(widths - {n}):
            zfw = jnp.zeros((S, w), jnp.float32)
            ziw = jnp.zeros((S, w), jnp.int32)
            out = chunk(scene, None, (zfw,) * scene.dim, zfw, ziw, key,
                        jnp.int32(0))
            jax.block_until_ready(out)
        img = jnp.zeros((n, 3), jnp.float32)
        out = _flush_jit(img, jnp.zeros((S, 3, n), jnp.float32), zi,
                         jnp.zeros((S, n), jnp.int32), n)
        jax.block_until_ready(out)
        # image-algebra helpers (shape-keyed; keeps a budgeted solve's
        # first interrupt from paying a remote compile inside the budget)
        from .wost import _add_images_jit, _image_init_jit, _scale_image_jit
        out = _scale_image_jit(
            _add_images_jit(img, _image_init_jit(jnp.zeros((n,), bool), img,
                                                 jnp.float32(0.0))),
            jnp.zeros((n,), jnp.float32))
        jax.block_until_ready(out)
        self._step0()

    def _solve_persistent(self, time_budget_s: float | None = None) -> int:
        """Balanced persistent-lane solve (wost.make_balanced_chunk).

        Per-pixel mean walk depth varies ~2-3x across the image, so fixed
        lane<->pixel binding idles shallow lanes while deep lanes straggle
        (measured 45% average occupancy).  A short warmup chunk measures
        per-pixel cost, then remaining samples are repartitioned into
        cost-balanced per-lane worklists until all quotas drain (~95%
        occupancy)."""
        from .wost import balanced_solve

        s = self.settings
        scene = self.problem.scene
        start = time.time()

        rd0, in_shell0, contrib0 = self._step0()

        # per-pixel walk-cost cache on the problem: later solves (GT +
        # budget sweeps, convergence runs) start cost-balanced from round 0
        # instead of paying an unbalanced probe round
        cache = self.problem.__dict__.setdefault("_cost_cache", {})
        ckey = (self.n_pixels, float(s.epsilonShell), int(s.maxWalkingDepth))
        # walk-rate cache (steps/s at this lane count): lets a later
        # budgeted solve on the same problem time-slice its FIRST round
        rcache = self.problem.__dict__.setdefault("_rate_cache", {})

        total, steps = balanced_solve(
            scene, None, np.asarray(self.eval_points), np.asarray(rd0),
            np.asarray(in_shell0 | ~self.mask), contrib0, in_shell0,
            spp=int(s.samplesPerPixel), eps=float(s.epsilonShell),
            max_depth=int(s.maxWalkingDepth),
            d_stack=self.problem.d_stack, n_stack=self.problem.n_stack,
            progress=_progress, chunk=self._chunk(),
            cost0=cache.get(ckey),
            cost_sink=lambda c: cache.__setitem__(ckey, c),
            time_budget_s=time_budget_s, start_time=start,
            rate0=rcache.get(self.n_pixels),
            rate_sink=lambda r: rcache.__setitem__(self.n_pixels, r),
            lane_multiple=self.mesh.devices.size if self.mesh else 1)
        self.total_walk_steps = steps
        total.block_until_ready()
        duration_ms = int((time.time() - start) * 1000)
        if hasattr(self.problem, "hint_cache_save"):
            self.problem.hint_cache_save()

        film = self.films["SOLUTION"]
        film.reset()
        film.put_frame(np.asarray(total) / s.samplesPerPixel)
        return duration_ms
