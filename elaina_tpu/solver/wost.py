"""Uniform Walk-on-Stars integrator, TPU-native.

Re-design of the reference's wavefront solve loop (integrator/uniform/
integrator.cu:64-623, WoSt paper Alg. 1).  The CUDA version routes walks
through atomic work queues with one kernel per stage; here the whole
wavefront is a fixed-shape *walk-state array* of N = W*H lanes updated by
one fused, masked depth step, with the depth loop a ``lax.scan`` — no
queues, no atomics, races structurally impossible (SURVEY.md §7
"Architecture stance").

Stage parity map (per depth step, same order as solveImpl 552-574):
  _separate       <- separateEvaluationPointImpl (integrator.cu:102-212)
  _boundary_term  <- handleBoundaryImpl          (integrator.cu:214-232)
  _source_term    <- sampleSourceImpl            (integrator.cu:234-316)
  _neumann_term   <- sampleNeumannImpl           (integrator.cu:318-445)
  _walk           <- oneStepWalkImpl             (integrator.cu:447-526)

Randomness: the per-pixel PCG streams of the reference become counter-based
``jax.random`` keys folded on (sample, depth, stage, lane) — statistically
equivalent, reproducible, and free of cross-lane state.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import Scene
from ..geometry import queries as Q
from ..geometry.grid import (grid_closest_point, grid_closest_point_detail,
                             grid_row_index)
from ..geometry.primitives import (
    prim_project,
    prim_sample_point,
    prim_side,
)
from ..utils.mathops import frame_from_normal, geometric_interpolate, to_world
from ..utils.rng import deterministic, pkey
from .green import green_eval, green_norm, green_sample_radius
from .sampling import (
    sphere_measure,
    uniform_sample_hemisphere,
    uniform_sample_hemisphere_pdf,
    uniform_sample_sphere,
    uniform_sample_sphere_pdf,
)


class WalkState(NamedTuple):
    pos: jnp.ndarray         # (N, D)
    thp: jnp.ndarray         # (N,) throughput — the reference carries a
    #   Color (workitem.h:25) but only ever updates it by SCALAR divisions
    #   (pdf, alpha, sphere measure; integrator.cu:521), so channels stay
    #   identical for a walk's whole life: a scalar is exact and cuts the
    #   per-step state + record traffic 3x on this member
    active: jnp.ndarray      # (N,) walk still alive
    on_neumann: jnp.ndarray  # (N,) currently on the Neumann boundary
    n_normal: jnp.ndarray    # (N, D) boundary normal when on_neumann


def init_walk_state(eval_points, active):
    n = eval_points.shape[0]
    d = eval_points.shape[1]
    return WalkState(
        pos=eval_points,
        thp=jnp.ones((n,), jnp.float32),
        active=active,
        on_neumann=jnp.zeros((n,), bool),
        n_normal=jnp.zeros((n, d), jnp.float32),
    )


def _gather_prim_verts(gs, pid):
    return Q._prim_verts_at(gs, pid)


def _surface_color(dim, colors, gs, pid, side, uv):
    """Side-selected two-sided vertex color, geometrically interpolated
    (integrator/common.h:242-260)."""
    safe = jnp.maximum(pid, 0)
    if colors.shape[0] <= Q.ONEHOT_GATHER_MAX:
        # tiny boundary (shipped Neumann sets): one-hot contraction beats
        # XLA's per-element gather cost by ~10x inside the depth step
        per_prim = jnp.concatenate(
            [colors[gs.indices[:, k]].reshape(gs.indices.shape[0], 6)
             for k in range(dim)], axis=-1)                  # (P, dim*6)
        flat = Q.small_gather(per_prim, safe)                # (N, dim*6)
        pick = jnp.where(side >= 0, 0, 1)[:, None]           # (N, 1)
        vals = tuple(
            jnp.where(pick == 0,
                      flat[:, k * 6:k * 6 + 3], flat[:, k * 6 + 3:k * 6 + 6])
            for k in range(dim))
        return geometric_interpolate(dim, vals, uv)
    idx = gs.indices[safe]                                   # (N, dim)
    pick = jnp.where(side[..., None] >= 0, 0, 1)             # (N, 1)
    vals = tuple(
        colors[idx[..., k], pick[..., 0]] for k in range(dim)
    )                                                        # dim x (N, 3)
    return geometric_interpolate(dim, vals, uv)


def dirichlet_distance(scene: Scene, q, stack_size: int):
    """Closest point on the Dirichlet boundary via the best accelerator."""
    gs = scene.dirichlet.gs
    if scene.d_grid is not None:
        return grid_closest_point(scene.d_grid, gs.verts, gs.indices, q)
    return Q.closest_point(gs, q, stack_size)


def dirichlet_distance_masked(scene: Scene, q, active, eps, stack_size: int,
                              step0=None):
    """Closest Dirichlet point with lazy exactness.

    Returns (R_D, pid, pv, need): R_D is EXACT where ``need`` (the lane
    might be inside the eps-shell, or is close enough that the step size
    would suffer), and a provably-valid LOWER BOUND elsewhere — valid as a
    star radius, and provably > eps there (so never in-shell).  pid and the
    primitive corner coordinates ``pv`` are only meaningful where ``need``.

    The point: lanes that don't need exactness skip their candidate-row
    fetch entirely on TPU (the scattered-row DMA rate is the solve's
    hardware floor), and dead lanes skip it too.
    """
    gs = scene.dirichlet.gs
    g = scene.d_grid
    if g is None:
        d, pid = Q.closest_point(gs, q, stack_size)
        pv = _gather_prim_verts(gs, pid)
        need = jnp.ones_like(d, bool) & active
        if step0 is not None:
            fresh, rd0 = step0
            need &= ~fresh
        return d, pid, pv, need
    if g.fine is not None and g.fine.eps == float(eps):
        # dense finest-level packed table: one gather gives row + need + rl.
        # The need bit is baked with the build eps — a caller passing a
        # different eps falls through to the row_lbound path below.
        from ..geometry.grid import fine_decode
        row, need_f, rl, outside = fine_decode(g.fine, q)
        need = active & (need_f | outside)
    else:
        row = grid_row_index(g, q)
        rl = g.row_lbound[row]
        diam = g.row_diag[row]
        # out-of-grid lanes clamp to a border cell whose lower bound is not
        # valid for them: always compute those exactly
        res = jnp.asarray([r for r in g.res], jnp.float32)
        rel = (q - g.origin) * g.inv_cell
        outside = jnp.any((rel < 0.0) | (rel >= res), axis=-1)
        need = active & ((rl < eps + diam) | outside)
    if step0 is not None:
        fresh, rd0 = step0
        need &= ~fresh
    import os
    if os.environ.get("ELAINA_DEBUG_NO_FETCH") == "1":  # cost-profiling aid
        need = need & False
    d_e, pid, pv = grid_closest_point_detail(g, gs.verts, gs.indices, q,
                                             need=need, row=row)
    R_D = jnp.where(need, d_e, rl)
    if step0 is not None:
        R_D = jnp.where(step0[0], step0[1], R_D)
    return R_D, pid, pv, need


def fast_dirichlet_available(scene: Scene, eps: float) -> bool:
    """Static gate for the bitmask-kernel fast path (ops/pallas_resolve).

    3D caps the candidate count at 512: the sweep scratch holds 9 corner
    planes per candidate tile (RBL * 9 * rpp * 128 * 4 B), so K=512 uses
    ~4.7 MB of the ~16 MB VMEM; 2D (4 planes) allows 1024."""
    from ..geometry.grid import _pallas_interpret, _use_pallas
    g = scene.d_grid
    if g is None:
        return False
    k_cap = 1024 if len(g.res) == 2 else 512
    return (g.fine is not None
            and g.fine.eps == float(eps) and g.coords is not None
            and g.crows is not None and g.cpack is not None
            and len(g.res) in (2, 3) and g.cand.shape[1] <= k_cap
            and (_use_pallas() or _pallas_interpret()))


def _fast_dirichlet(scene: Scene, q, active, eps: float, step0=None):
    """Bitmask-kernel Dirichlet resolve (the round-2 hot path).

    One dense FinePack gather (fine_decode: ~19 ns/lane, the measured
    XLA-gather floor) classifies every lane; the candidate-row sweep and
    the surface-color fetch then run as per-lane-DMA Pallas kernels that
    touch ONLY the lanes whose need bit / in-shell bit fired — replacing
    the round-1 always-on DMA sweep (~2.6 ms/step) and the dense XLA
    color-gather chain (~1.9 ms/step).  See ops/pallas_resolve.py for the
    kernel design and the measurements motivating it.

    Returns (R_D, in_shell, color (N, 3), need).
    """
    from ..geometry.grid import _pallas_interpret, fine_decode
    from ..ops.pallas_resolve import (compact_lanes, fetch_colors,
                                      fetch_colors3, kprime_for,
                                      pack_groups, sweep_resolve,
                                      sweep_resolve_3d)
    g = scene.d_grid
    fp = g.fine
    dim = scene.dim

    row, need_f, rl, outside = fine_decode(fp, q)
    need = active & (need_f | outside)
    if step0 is not None:
        fresh, rd0 = step0
        need &= ~fresh
    if os.environ.get("ELAINA_DEBUG_NO_FETCH") == "1":  # cost-profiling aid
        need &= False

    interp = _pallas_interpret()
    K = g.cand.shape[1]
    rpp = -(-K // 128)
    n = q.shape[0]

    def resolve(mask, row_m, q_m, m_eps):
        """sweep + in-shell test + color interpolation on any lane layout.
        Returns (N_m, 7): [d_exact, uv..., col.rgb, in_shell]."""
        if dim == 2:
            d_e, t, side, pid = sweep_resolve(
                pack_groups(mask), row_m, q_m, g.coords, g.cpack, rpp=rpp,
                kprime=kprime_for(K), interpret=interp)
            ins = mask & (d_e < m_eps) & (t > 0.0) & (t < 1.0)
            cfi = 2 * jnp.maximum(pid, 0) + jnp.where(side < 0, 1, 0)
            c0, c1 = fetch_colors(pack_groups(ins), jnp.where(ins, cfi, 0),
                                  g.crows, interpret=interp)
            col = c0 * (1.0 - t[:, None]) + c1 * t[:, None]
            return jnp.concatenate(
                [d_e[:, None], t[:, None], side[:, None], col,
                 ins.astype(jnp.float32)[:, None]], axis=-1)
        # 3D: the kernel returns the winner's corner coordinates; uv /
        # side / interior run in XLA on the (compacted) lanes
        d_e, pid, pv = sweep_resolve_3d(
            pack_groups(mask), row_m, q_m, g.coords, g.cpack, rpp=rpp,
            kprime=kprime_for(K), interpret=interp)
        uv = prim_project(3, q_m, pv)
        side = prim_side(3, q_m, pv)
        interior = ((uv[..., 0] > 0.0) & (uv[..., 1] > 0.0)
                    & (uv[..., 0] + uv[..., 1] < 1.0))
        ins = mask & (d_e < m_eps) & interior
        cfi = 2 * jnp.maximum(pid, 0) + jnp.where(side < 0, 1, 0)
        ca, cb, cc = fetch_colors3(pack_groups(ins), jnp.where(ins, cfi, 0),
                                   g.crows, interpret=interp)
        col = geometric_interpolate(3, (ca, cb, cc), uv)
        return jnp.concatenate(
            [d_e[:, None], uv, col, ins.astype(jnp.float32)[:, None]],
            axis=-1)

    if 2048 <= n <= 384 * 1024:
        # compact the scattered need lanes into a dense prefix first:
        # every 256-lane block with ANY set lane pays the full dense
        # winner-select phase, so scattered masks cost ~6x clustered ones
        # (tools/tpu_resolve_probe.py).  Falls back to the uncompacted
        # sweep when the need count overflows the static capacity.
        # steady-state need fractions are ~10%; n//4 leaves 2.5x headroom
        # before the cond falls back to the uncompacted sweep.
        # Upper gate: the compact kernel is scalar — its mask operand
        # (n/8 words) and lane-id output (n/4) both live in the 1 MB
        # SMEM, 1.5n bytes total; 1024^2-lane solves blew SMEM by 512K
        # (refscale r3d), so past 384k lanes the uncompacted bitmask
        # sweep (the pre-compaction fast path) runs instead
        cap = max(1024, n // 4)
        lanes, cnt = compact_lanes(pack_groups(need), cap=cap,
                                   interpret=interp)
        cnt = cnt[0]

        def compacted(_):
            valid = jnp.arange(cap) < cnt
            safe = jnp.where(valid, lanes, 0)
            out_c = resolve(valid, row[safe], q[safe], eps)
            idx = jnp.where(valid, lanes, n)        # OOB -> dropped
            return jnp.zeros((n, 7), jnp.float32).at[idx].set(
                out_c, mode="drop")

        def uncompacted(_):
            return resolve(need, row, q, eps)

        out = jax.lax.cond(cnt <= cap, compacted, uncompacted, 0)
    else:
        out = resolve(need, row, q, eps)

    d_exact, t = out[:, 0], out[:, 1]
    side = out[:, 2]
    color = out[:, 3:6]
    in_shell = need & (out[:, 6] > 0.5)

    R_D = jnp.where(need, d_exact, rl)
    if g.trunc_min_rl < 2.0 * float(eps) and g.row_trunc is not None:
        # Truncated nearest-K rows whose lower bound can fire the need
        # bit (last-level cells with band > K near the shell): the
        # sweep's min-over-K can OVERESTIMATE the true distance there,
        # breaking star-ball emptiness — fall back to the cell lower
        # bound, matching the generic path's grid._trunc_fallback
        # (ADVICE r3 #1).  Statically compiled out when every truncated
        # row sits far above eps (deep-interior rows, rl >= 4|h|):
        # rl_dec > rl * 2^(-1/s), so need cannot fire once
        # trunc_min_rl >= 2*eps.  Out-of-grid lanes keep the sweep
        # result (the border cell's bound is not valid for them either).
        tr = need & ~outside & g.row_trunc[row]
        R_D = jnp.where(tr, g.row_lbound[row], R_D)
    if step0 is not None:
        R_D = jnp.where(fresh, rd0, R_D)
    in_shell &= R_D < eps
    color = jnp.where(in_shell[:, None], color, 0.0)
    return R_D, in_shell, color, need


def _separate(scene: Scene, state: WalkState, eps: float, stack_size: int,
              shrink: bool, step0=None):
    """Star-radius computation + epsilon-shell classification.

    Returns (in_shell, R_B, bcolor, R_D) where ``bcolor`` is the
    side-selected, interpolated boundary surface color (valid at least on
    in-shell lanes; NOT yet scaled by intensity or throughput).
    ``shrink`` applies the 0.99 stability factor (uniform/integrator.cu:195;
    the guided variant omits it, guided/integrator.cu:239).

    ``step0`` (optional): (fresh (N,) bool, rd0 (N,)) — lanes at their
    walk's first step reuse the cached exact eval-point distance instead of
    fetching (every sample of a pixel repeats the identical step-0 query;
    in-shell pixels never even restart, the integrator pre-resolves them).
    """
    dim = scene.dim
    q = state.pos
    n = q.shape[0]
    if scene.dirichlet is None:
        R_D = jnp.full((n,), jnp.inf)
        in_shell = jnp.zeros((n,), bool)
        bcolor = jnp.zeros((n, 3), jnp.float32)
    elif fast_dirichlet_available(scene, eps):
        R_D, in_shell, bcolor, _ = _fast_dirichlet(
            scene, q, state.active, eps, step0=step0)
    else:
        R_D, pid_d, pv, need = dirichlet_distance_masked(
            scene, q, state.active, eps, stack_size, step0=step0)
        uv = prim_project(dim, q, pv)
        side = prim_side(dim, q, pv)
        if dim == 2:
            interior = (uv > 0.0) & (uv < 1.0)
        else:
            interior = (uv[..., 0] > 0) & (uv[..., 1] > 0) & (
                uv[..., 0] + uv[..., 1] < 1.0)
        in_shell = need & (R_D < eps) & interior
        bcolor = _surface_color(dim, scene.dirichlet.colors,
                                scene.dirichlet.gs, pid_d, side, uv)

    if scene.neumann is not None:
        if scene.n_sgrid is not None:
            R_N = Q.grid_closest_silhouette(scene.n_sgrid,
                                            scene.neumann.gs, q)
        else:
            R_N = Q.closest_silhouette(scene.neumann.gs, q)
        if scene.n_bgrid is not None:
            # clamp the star radius to the prim band's completeness cap
            # (minus a 2*eps margin for the eps-offset ray origins of
            # _walk/_neumann_term/_source_term): within it, ONE band row
            # is a complete candidate set for every in-ball/ray query of
            # this step.  Always valid — a smaller star radius only
            # costs steps.  Cells with r_cap < 2*eps + 1e-4 would fall
            # to the global 1e-4 floor below and could miss prims at
            # eps-scale distances; build stats record r_cap_min so such
            # scenes are visible (none of the shipped ones are).
            rcap = Q.band_r_cap(scene.n_bgrid, q)
            R_N = jnp.minimum(R_N, jnp.maximum(rcap - 2.0 * eps, 0.0))
    else:
        R_N = jnp.full(q.shape[:1], jnp.inf)

    R_B = jnp.maximum(1e-4, jnp.minimum(R_D, R_N))
    if shrink:
        R_B = R_B * 0.99
    return in_shell, R_B, bcolor, R_D


def _boundary_term(scene: Scene, state: WalkState, in_shell, bcolor):
    """Dirichlet epsilon-shell contribution (integrator.cu:214-232)."""
    import os
    if os.environ.get("ELAINA_DEBUG_NO_COLOR") == "1":  # cost-profiling aid
        bcolor = jnp.ones((state.pos.shape[0], 3), jnp.float32)
    contrib = bcolor * scene.dirichlet_intensity * state.thp[:, None]
    return jnp.where((state.active & in_shell)[:, None], contrib, 0.0)


def _sample_direction(key, state: WalkState, dim: int,
                      has_neumann: bool = True):
    """Hemisphere around the Neumann normal when on the boundary, else the
    full sphere; returns (dir, pdf, alpha) (integrator.cu:264-278/470-485).

    ``has_neumann=False`` (Dirichlet-only scene) statically removes the
    hemisphere branch: no lane can ever walk onto a Neumann boundary, so
    ``on_neumann`` is identically False — XLA cannot know that through a
    dynamic ``where``, but the trace can."""
    n = state.pos.shape[0]
    k1, k2 = jax.random.split(key)
    d_sph = uniform_sample_sphere(k1, (n,), dim)
    if not has_neumann:
        return (d_sph, jnp.full((n,), uniform_sample_sphere_pdf(dim)),
                jnp.ones((n,)))
    d_hem_local = uniform_sample_hemisphere(k2, (n,), dim)
    d_hem = to_world(dim, frame_from_normal(dim, state.n_normal), d_hem_local)
    on = state.on_neumann
    direction = jnp.where(on[:, None], d_hem, d_sph)
    pdf = jnp.where(on, uniform_sample_hemisphere_pdf(dim),
                    uniform_sample_sphere_pdf(dim))
    alpha = jnp.where(on, 0.5, 1.0)
    return direction, pdf, alpha


def _source_term(scene: Scene, state: WalkState, live, R_B, key, eps: float,
                 n_stack: int):
    """Volumetric source contribution (integrator.cu:234-316)."""
    dim = scene.dim
    k_dir, k_rad = jax.random.split(key)
    direction, dir_pdf, alpha = _sample_direction(
        k_dir, state, dim, scene.neumann is not None)

    dist = R_B
    if scene.neumann is not None:
        offset = state.pos + eps * direction
        if scene.n_bgrid is not None:
            hit, t, _ = Q.band_ray_intersect(scene.n_bgrid, scene.neumann.gs,
                                             offset, direction, dist,
                                             ref=state.pos)
        else:
            hit, t, _ = Q.ray_intersect(scene.neumann.gs, offset, direction,
                                        dist, n_stack)
        dist = jnp.where(hit, jnp.minimum(t, dist), dist)

    u = jax.random.uniform(k_rad, state.pos.shape[:1] + (3,))
    r, _ = green_sample_radius(u, R_B, dim)
    value = scene.source.sample(state.pos + r[:, None] * direction)
    value = value * scene.source_intensity
    # conditionalSampleSpherePDF ratio (integrator.cu:313): the r-powers
    # cancel, leaving uniform-sphere-pdf / dir-pdf / alpha.
    scale = green_norm(R_B, dim) * (uniform_sample_sphere_pdf(dim) / dir_pdf) / alpha
    contrib = state.thp[:, None] * value * scale[:, None]
    ok = live & (r <= dist)
    return jnp.where(ok[:, None], contrib, 0.0)


def _neumann_term(scene: Scene, state: WalkState, live, R_B, key, eps: float,
                  n_stack: int):
    """Neumann boundary-integral contribution, subtracted
    (integrator.cu:318-445)."""
    dim = scene.dim
    gs = scene.neumann.gs
    k_sel, k_pt = jax.random.split(key)
    u_sel = jax.random.uniform(k_sel, state.pos.shape[:1])
    if scene.n_bgrid is not None:
        pid, pdf = Q.band_sample_in_ball(scene.n_bgrid, gs, state.pos, R_B,
                                         u_sel)
    else:
        pid, pdf = Q.sample_in_ball(gs, state.pos, R_B, u_sel)
    valid = (pid >= 0) & (pdf > 0)

    u_pt = jax.random.uniform(k_pt, state.pos.shape[:1] + (2,))
    pv = _gather_prim_verts(gs, pid)
    sample_pt = prim_sample_point(dim, pv, u_pt[:, 0], u_pt[:, 1])
    r = jnp.linalg.norm(sample_pt - state.pos, axis=-1)
    valid &= (r < R_B) & (r > 0)

    # first-intersection visibility check (integrator.cu:372-394)
    origin = state.pos + jnp.where(state.on_neumann[:, None],
                                   eps * state.n_normal, 0.0)
    ray = sample_pt - origin
    clamp_dist = jnp.linalg.norm(ray, axis=-1)
    ray_dir = ray / jnp.maximum(clamp_dist, 1e-20)[:, None]
    if scene.n_bgrid is not None:
        occluded, _, _ = Q.band_ray_intersect(scene.n_bgrid, gs, origin,
                                              ray_dir, clamp_dist - eps,
                                              ref=state.pos)
    else:
        occluded, _, _ = Q.ray_intersect(gs, origin, ray_dir,
                                         clamp_dist - eps, n_stack,
                                         any_hit=True)
    valid &= ~occluded

    side = prim_side(dim, state.pos, pv)
    normal = Q.small_gather(gs.prim_normal, jnp.maximum(pid, 0))
    side_on = jnp.sign(jnp.sum(normal * state.n_normal, axis=-1))
    side = jnp.where(state.on_neumann, side_on, side)
    valid &= side != 0

    uv = prim_project(dim, sample_pt, pv)
    color = _surface_color(dim, scene.neumann.colors, gs, pid, side, uv)
    alpha = jnp.where(state.on_neumann, 0.5, 1.0)
    weight = green_eval(jnp.maximum(r, 1e-20), R_B, dim) / alpha / jnp.maximum(pdf, 1e-30)
    contrib = (color * scene.neumann_intensity
               * (state.thp * weight)[:, None])
    ok = live & valid
    return jnp.where(ok[:, None], -contrib, 0.0)


def fused_band_available(scene: Scene) -> bool:
    """Static gate for the fused Neumann-band step kernel
    (ops/pallas_queries.band_neumann_walk_dma_3d): 3D prim-band grid with
    a packed coords table.  ELAINA_FUSED_BAND=0 restores the three-kernel
    path for A/B."""
    from ..geometry.grid import _pallas_interpret, _use_pallas
    return (scene.neumann is not None and scene.n_bgrid is not None
            and getattr(scene.n_bgrid, "coords", None) is not None
            and scene.dim == 3
            and (_use_pallas() or _pallas_interpret())
            and os.environ.get("ELAINA_FUSED_BAND", "1") != "0")


def _neumann_walk_fused(scene: Scene, state: WalkState, live, R_B, key,
                        eps: float, direction, pdf, alpha):
    """Fused _neumann_term + _walk: the in-ball sample, its visibility
    ray, and the walk ray share ONE band-block DMA kernel (the unfused
    path re-DMAs the same per-lane block three times and gathers the
    winners' vertices back in XLA).  Returns (contrib, state') with
    semantics identical to _neumann_term followed by _walk.

    Reference: sampleNeumannImpl + oneStepWalkImpl
    (uniform/integrator.cu:318-445, 447-526)."""
    dim = scene.dim
    gs = scene.neumann.gs
    n = state.pos.shape[0]
    k_sel, k_pt = jax.random.split(key)
    u_sel = jax.random.uniform(k_sel, (n,))
    u_pt = jax.random.uniform(k_pt, (n, 2))

    o = Q.band_neumann_walk(scene.n_bgrid, gs, state.pos, R_B,
                            state.on_neumann, state.n_normal, u_sel, u_pt,
                            direction, eps)

    # ---- Neumann boundary-integral contribution ----
    valid = (o.pid >= 0) & (o.pdf_area > 0)
    r = jnp.linalg.norm(o.sample_pt - state.pos, axis=-1)
    valid &= (r < R_B) & (r > 0)
    valid &= ~o.occluded
    side_on = jnp.sign(jnp.sum(o.plane_n * state.n_normal, axis=-1))
    side = jnp.where(state.on_neumann, side_on, o.side)
    valid &= side != 0
    # barycentrics of the in-kernel sample point (prim_sample_point 3D:
    # p = a + b1*(b-a) + b2*(c-a) with b1 = u2*sqrt(u1),
    # b2 = sqrt(u1)*(1-u2))
    su = jnp.sqrt(u_pt[:, 0])
    b1 = u_pt[:, 1] * su
    uv = jnp.stack([b1, su - b1], axis=-1)
    color = _surface_color(dim, scene.neumann.colors, gs,
                           jnp.maximum(o.pid, 0), side, uv)
    alpha_n = jnp.where(state.on_neumann, 0.5, 1.0)
    weight = green_eval(jnp.maximum(r, 1e-20), R_B, dim) / alpha_n \
        / jnp.maximum(o.pdf_area, 1e-30)
    contrib = (color * scene.neumann_intensity
               * (state.thp * weight)[:, None])
    contrib = jnp.where((live & valid)[:, None], -contrib, 0.0)

    # ---- walk step from the fused ray results ----
    current = state.pos + jnp.where(state.on_neumann[:, None],
                                    eps * state.n_normal, 0.0)
    n_flip = jnp.where(jnp.sum(o.wnormal * direction, axis=-1,
                               keepdims=True) > 0, -o.wnormal, o.wnormal)
    normal = jnp.where(o.whit[:, None], n_flip, 0.0)
    next_pos = jnp.where(o.whit[:, None],
                         current + o.wt[:, None] * direction,
                         state.pos + R_B[:, None] * direction)
    thp = state.thp / (pdf * alpha * sphere_measure(dim))
    state = WalkState(
        pos=jnp.where(live[:, None], next_pos, state.pos),
        thp=jnp.where(live, thp, state.thp),
        active=state.active,
        on_neumann=jnp.where(live, o.whit, state.on_neumann),
        n_normal=jnp.where(live[:, None], normal, state.n_normal),
    )
    return contrib, state


def _walk(scene: Scene, state: WalkState, live, R_B, key, eps: float,
          n_stack: int, direction=None, pdf=None, alpha=None):
    """One mean-value step: sample a direction, clip on the Neumann boundary,
    update throughput (integrator.cu:447-526).  Guided callers pass their own
    (direction, pdf, alpha)."""
    dim = scene.dim
    if direction is None:
        direction, pdf, alpha = _sample_direction(
            key, state, dim, scene.neumann is not None)

    next_pos = state.pos + R_B[:, None] * direction
    hit = jnp.zeros(state.pos.shape[:1], bool)
    normal = jnp.zeros_like(state.pos)
    if scene.neumann is not None:
        current = state.pos + jnp.where(state.on_neumann[:, None],
                                        eps * state.n_normal, 0.0)
        gs = scene.neumann.gs
        if scene.n_bgrid is not None:
            hit, t, pid = Q.band_ray_intersect(scene.n_bgrid, gs, current,
                                               direction, R_B, ref=state.pos)
        else:
            hit, t, pid = Q.ray_intersect(gs, current, direction, R_B,
                                          n_stack)
        n_raw = Q.small_gather(gs.prim_normal, jnp.maximum(pid, 0))
        # shading normal: oppose the incoming direction (integrator.cu:509-512)
        n_flip = jnp.where(jnp.sum(n_raw * direction, axis=-1,
                                   keepdims=True) > 0, -n_raw, n_raw)
        normal = jnp.where(hit[:, None], n_flip, normal)
        next_pos = jnp.where(hit[:, None], current + t[:, None] * direction,
                             next_pos)

    thp = state.thp / (pdf * alpha * sphere_measure(dim))
    return WalkState(
        pos=jnp.where(live[:, None], next_pos, state.pos),
        thp=jnp.where(live, thp, state.thp),
        active=state.active,  # caller narrows to the live set
        on_neumann=jnp.where(live, hit, state.on_neumann),
        n_normal=jnp.where(live[:, None], normal, state.n_normal),
    )


def wost_depth_step(scene: Scene, state: WalkState, key, eps: float,
                    d_stack: int, n_stack: int, step0=None):
    """One fused depth iteration for every lane.  Returns (state', contrib)."""
    k_sep, k_src, k_neu, k_walk = jax.random.split(key, 4)

    in_shell, R_B, bcolor, _ = _separate(
        scene, state, eps, d_stack, shrink=True, step0=step0)
    in_shell &= state.active

    contrib = jnp.zeros((state.pos.shape[0], 3), jnp.float32)
    if scene.dirichlet is not None:
        contrib += _boundary_term(scene, state, in_shell, bcolor)

    # lanes that terminated (in shell) or have an unbounded star die here
    live = state.active & (~in_shell) & jnp.isfinite(R_B)

    if scene.source is not None:
        contrib += _source_term(scene, state, live, R_B, k_src, eps, n_stack)
    if scene.neumann is not None and fused_band_available(scene):
        direction, pdf, alpha = _sample_direction(k_walk, state,
                                                  scene.dim, True)
        cn, state = _neumann_walk_fused(scene, state, live, R_B, k_neu,
                                        eps, direction, pdf, alpha)
        contrib += cn
        state = state._replace(active=live)
        return state, contrib
    if scene.neumann is not None:
        contrib += _neumann_term(scene, state, live, R_B, k_neu, eps, n_stack)

    state = _walk(scene, state, live, R_B, k_walk, eps, n_stack)
    state = state._replace(active=live)
    return state, contrib


def make_persistent_chunk(*, eps: float, max_depth: int,
                          spp: int, iter_chunk: int, d_stack: int = 48,
                          n_stack: int = 48):
    """Persistent-lane solve chunk (jit once, dispatch repeatedly).

    Lane i owns pixel i and runs its spp samples BACK-TO-BACK: the moment a
    walk dies the lane restarts with its pixel's next sample, keeping the
    wavefront ~fully live.  A fixed-shape depth scan pays its full-width
    per-step cost (gathers, dense sweeps) whether lanes are alive or not —
    measured 15 ms/step with every lane dead — so with walks averaging ~9
    steps a 64-deep scan wastes ~85% of the machine.  Persistent lanes
    amortize that fixed cost over ~100% live work.  (The reference's
    wavefront regenerates its queues per sample instead:
    uniform/integrator.cu:550-575; this is the TPU-native equivalent of
    persistent-threads scheduling.)

    Returns a jitted function
        chunk(scene, eval_points, mask, rd0, key, carry)
            -> (carry', remaining, steps)
    where carry = (state, acc, sample_idx, walk_step, it); call
    ``persistent_carry_init`` for the initial carry (or
    ``compute_step0`` + ``persistent_carry_from_step0`` to pre-resolve
    in-shell pixels).  ``rd0`` is the cached exact eval-point Dirichlet
    distance: restarting lanes reuse it instead of re-fetching their
    candidate row (every sample repeats the identical step-0 query).
    ``remaining`` is a scalar bool (host reads it once per chunk);
    ``steps`` counts executed (live-lane) walk steps in this chunk.  The
    scene is a device argument, not a closure capture (remote-compile
    payload safety).
    """

    def chunk(scene, eval_points, mask, rd0, key, carry):
        def cond(c):
            st, acc, sidx, wstep, it, it0, steps = c
            return ((it - it0) < iter_chunk) & (
                jnp.any(st.active) | jnp.any(sidx < spp))

        def body(c):
            st, acc, sidx, wstep, it, it0, steps = c
            restart = (~st.active) & (sidx < spp) & mask
            st = WalkState(
                pos=jnp.where(restart[:, None], eval_points, st.pos),
                thp=jnp.where(restart, 1.0, st.thp),
                active=st.active | restart,
                on_neumann=jnp.where(restart, False, st.on_neumann),
                n_normal=jnp.where(restart[:, None], 0.0, st.n_normal),
            )
            sidx = sidx + restart.astype(jnp.int32)
            wstep = jnp.where(restart, 0, wstep)
            steps = steps + jnp.sum(st.active.astype(jnp.int32))
            k = jax.random.fold_in(key, it)
            # restarting lanes are at their pixel's eval point: reuse the
            # cached step-0 distance, skip their candidate-row fetch
            st, contrib = wost_depth_step(
                scene, st, k, eps, d_stack, n_stack, step0=(restart, rd0))
            wstep = wstep + st.active.astype(jnp.int32)
            # depth cap: kill walks that exhausted the budget
            # (uniform/integrator.cu:552 depth loop bound)
            st = st._replace(active=st.active & (wstep < max_depth))
            return st, acc + contrib, sidx, wstep, it + 1, it0, steps

        st, acc, sidx, wstep, it = carry
        init = (st, acc, sidx, wstep, it, it, jnp.int32(0))
        st, acc, sidx, wstep, it, _, steps = jax.lax.while_loop(
            cond, body, init)
        remaining = jnp.any(st.active) | jnp.any(sidx < spp)
        return (st, acc, sidx, wstep, it), remaining, steps

    return jax.jit(chunk)


N_PIECES = 4   # worklist slots per lane in the balanced chunk
ITER_DISPATCH_BUDGET = int(os.environ.get("ELAINA_ITER_BUDGET", "1024"))
#   max while-loop iterations per dispatch (the tunneled TPU watchdog
#   kills minute-long dispatches; ~1000 iters ~ 10-35s on the 2D scenes).
#   Env-overridable: scenes with expensive per-iteration queries (3D
#   Neumann silhouette sweeps) need shorter dispatches to stay under the
#   watchdog while per-iter cost is being measured.


def build_balanced_pieces(rem: np.ndarray, cost: np.ndarray,
                          n_lanes: int, s: int = N_PIECES,
                          shuffle=None):
    """Cost-balanced contiguous partition of remaining samples into per-lane
    worklists (host-side, numpy).

    rem: (P,) remaining samples per pixel; cost: (P,) estimated steps per
    sample (measured walk depth).  Every lane receives up to ``s``
    contiguous (pixel, quota) pieces whose total estimated cost is ~W/M;
    heavy pixels are split across consecutive lanes.  Returns
    (piece_pix (s, M) int32, piece_quota (s, M) int32) with quota 0 padding.

    ``shuffle`` (a numpy Generator) randomizes the pixel order before
    partitioning: budgeted rounds cut by an iteration cap lose each
    lane's list TAIL, and with index order those are the SAME pixels
    every round (systematic completion skew); a fresh permutation per
    round makes the loss a random subset (even in expectation).

    Why: with lane == pixel, per-pixel mean walk depth varies ~2-3x across
    the image, so shallow-pixel lanes idle while deep-pixel lanes straggle
    — measured 45% occupancy over a full solve vs 95% in steady state.
    """
    rem = rem.astype(np.int64)
    active = np.flatnonzero(rem > 0)
    piece_pix = np.zeros((s, n_lanes), np.int32)
    piece_quota = np.zeros((s, n_lanes), np.int32)
    if active.size == 0:
        return piece_pix, piece_quota
    if shuffle is not None:
        active = shuffle.permutation(active)
    ra = rem[active]
    c = np.maximum(cost[active].astype(np.float64), 1.0)
    w = c * ra
    cum = np.concatenate([[0.0], np.cumsum(w)])
    W = cum[-1]
    bounds = np.arange(n_lanes + 1) * (W / n_lanes)
    bi = np.clip(np.searchsorted(cum, bounds, side="right") - 1, 0,
                 ra.size - 1)
    frac = np.clip((bounds - cum[bi]) / np.maximum(w[bi], 1e-30), 0.0, 1.0)
    off = np.minimum((frac * ra[bi]).astype(np.int64), ra[bi])
    bi[-1], off[-1] = ra.size - 1, ra[-1]

    # lane j's piece k is active pixel bi[j] + k, clipped to lane j+1's
    # start; pieces past ``s`` stay in rem for the next repartition
    p0 = bi[:-1]          # (M,)
    p1 = bi[1:]
    o0 = off[:-1]
    o1 = off[1:]
    for k in range(s):
        p = p0 + k                                       # (M,)
        inside = p <= p1
        ps = np.minimum(p, ra.size - 1)
        b = np.where(p == p1, o1, ra[ps])
        a = np.where(k == 0, o0, 0)
        q = np.where(inside, np.maximum(b - a, 0), 0)
        piece_pix[k] = active[ps]
        piece_quota[k] = q
    return piece_pix, piece_quota


def make_balanced_chunk(step_fn=None, *, eps: float, max_depth: int,
                        d_stack: int = 48, n_stack: int = 48, mesh=None):
    """Balanced persistent solve chunk: per-lane worklists of (pixel, quota)
    pieces, run to completion (while_loop exits when every lane drained its
    worklist and all walks died; ``iter_cap`` is a safety bound).

    chunk(scene, extra, piece_pos, piece_rd0, piece_quota, key,
          iter_cap) -> (acc_slots (S, 3, N), done (S, N), lane_steps (N,),
          steps, iters)
    piece_pos is a D-tuple of (S, N) planar coordinate arrays ((N, S, D)
    would pad the minor dims to 128 lanes); piece_quota (S, N);
    piece_rd0 is the cached step-0 Dirichlet distance of the piece's pixel.
    The caller scatters acc_slots into the image by the host-known piece
    pixel ids (one segment_sum per chunk).

    ``step_fn(scene, extra, state, key, wstep, step0) -> (state', contrib)``
    customizes the walk step (the guided integrator passes its inference
    step); default is the uniform wost_depth_step.  ``extra`` is an
    arbitrary pytree threaded to step_fn (e.g. network params).

    With ``mesh`` (a 1-D jax.sharding.Mesh), the LANE axis shards across
    devices via shard_map: every device runs its OWN while_loop over its
    own worklist slice, so there is no per-iteration cross-chip sync at
    all — devices drain independently and only the scalar step/iter
    counters are psum/pmax-reduced at the end.  Scene and extra replicate
    (boundary data is MBs, SURVEY.md §2.2).  Per-shard RNG streams fold in
    the device index.  Requires lane count divisible by the mesh size.
    """
    S = N_PIECES

    if step_fn is None:
        def step_fn(scene, extra, st, k, wstep, step0):
            return wost_depth_step(scene, st, k, eps, d_stack, n_stack,
                                   step0=step0)

    def sel(slot, arr):
        """arr (S, N) -> per-lane value at the lane's current slot (dense
        S-way select; no gathers)."""
        out = jnp.zeros_like(arr[0])
        for k in range(S):
            out = jnp.where(slot == k, arr[k], out)
        return out

    def commit_dead(st, acc, pend, scnt, sidx, slot):
        """Commit terminated walks' pending sums into their slot.

        A walk's contributions accumulate in the per-lane ``pend`` buffer
        and only reach ``acc`` (and the completed count ``scnt``) when the
        walk terminates — so an iter_cap interrupt discards in-flight
        partial walks instead of committing a biased truncation (the sample
        re-runs next round).  ``scnt < sidx`` identifies in-flight lanes
        (started but uncommitted samples in the current slot)."""
        died = (~st.active) & (scnt < sidx)
        for kk in range(S):
            acc = acc.at[kk].add(
                jnp.where((died & (slot == kk))[None, :], pend, 0.0))
        scnt = scnt + died.astype(jnp.int32)
        pend = jnp.where(died[None, :], 0.0, pend)
        return acc, pend, scnt

    def chunk(scene, extra, piece_pos, piece_rd0, piece_quota, key,
              iter_cap):
        n = piece_pos[0].shape[1]

        def cond(c):
            st, acc, pend, scnt, slot, sidx, wstep, it, steps, lsteps = c
            quota = sel(slot, piece_quota)
            return (it < iter_cap) & (jnp.any(st.active)
                                      | jnp.any((slot < S) & (sidx < quota)))

        def body(c):
            st, acc, pend, scnt, slot, sidx, wstep, it, steps, lsteps = c
            acc, pend, scnt = commit_dead(st, acc, pend, scnt, sidx, slot)
            # advance exhausted pieces (quota 0 pads the worklist tail)
            quota = sel(slot, piece_quota)
            adv = (~st.active) & (sidx >= quota) & (slot < S)
            slot = jnp.where(adv, slot + 1, slot)
            sidx = jnp.where(adv, 0, sidx)
            scnt = jnp.where(adv, 0, scnt)
            quota = sel(slot, piece_quota)

            restart = (~st.active) & (sidx < quota) & (slot < S)
            pos0 = jnp.stack([sel(slot, p) for p in piece_pos], -1)
            rd0 = sel(slot, piece_rd0)
            st = WalkState(
                pos=jnp.where(restart[:, None], pos0, st.pos),
                thp=jnp.where(restart, 1.0, st.thp),
                active=st.active | restart,
                on_neumann=jnp.where(restart, False, st.on_neumann),
                n_normal=jnp.where(restart[:, None], 0.0, st.n_normal),
            )
            sidx = sidx + restart.astype(jnp.int32)
            live = st.active.astype(jnp.int32)
            steps = steps + jnp.sum(live)
            lsteps = lsteps + live
            wstep = jnp.where(restart, 0, wstep)
            k = jax.random.fold_in(key, it)
            st, contrib = step_fn(scene, extra, st, k, wstep,
                                  (restart, rd0))
            # pend is (3, N) — an (N, 3) layout would pad 3 -> 128 lanes
            pend = pend + contrib.T
            wstep = wstep + st.active.astype(jnp.int32)
            st = st._replace(active=st.active & (wstep < max_depth))
            return st, acc, pend, scnt, slot, sidx, wstep, it + 1, steps, lsteps

        st0 = init_walk_state(jnp.stack([p[0] for p in piece_pos], -1),
                              jnp.zeros((n,), bool))
        init = (st0, jnp.zeros((S, 3, n), jnp.float32),
                jnp.zeros((3, n), jnp.float32),
                jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
                jnp.zeros((n,), jnp.int32),
                jnp.zeros((n,), jnp.int32), jnp.int32(0), jnp.int32(0),
                jnp.zeros((n,), jnp.int32))
        (st, acc, pend, scnt, slot, sidx, wstep, it, steps,
         lsteps) = jax.lax.while_loop(cond, body, init)
        # walks that died on the final iteration commit here; walks still
        # in flight at iter_cap are dropped (scnt stays behind sidx, so
        # their sample re-runs next round)
        acc, pend, scnt = commit_dead(st, acc, pend, scnt, sidx, slot)
        done = jnp.stack(
            [jnp.where(slot > k, piece_quota[k],
                       jnp.where(slot == k, scnt, 0)) for k in range(S)])
        return acc, done, lsteps, steps, it

    if mesh is None:
        return jax.jit(chunk)

    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def local(scene, extra, piece_pos, piece_rd0, piece_quota, key,
              iter_cap):
        # decorrelate per-shard RNG streams (identical keys would draw the
        # same uniforms on every device)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        acc, done, lsteps, steps, it = chunk(
            scene, extra, piece_pos, piece_rd0, piece_quota, key, iter_cap)
        return (acc, done, lsteps, jax.lax.psum(steps, axis),
                jax.lax.pmax(it, axis))

    lane = P(None, axis)
    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), lane, lane, lane, P(), P()),
        out_specs=(P(None, None, axis), lane, P(axis), P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def flush_balanced(image, acc, done, piece_pix, n_pixels: int):
    """Scatter a balanced chunk's per-piece sums into the pixel image and
    return (image', done_per_pixel).  piece_pix: (S, N) host int32."""
    seg = jnp.asarray(piece_pix.reshape(-1))
    chans = [jax.ops.segment_sum(acc[:, ch, :].reshape(-1), seg,
                                 num_segments=n_pixels) for ch in range(3)]
    image = image + jnp.stack(chans, -1)
    done_pix = jax.ops.segment_sum(done.reshape(-1), seg,
                                   num_segments=n_pixels)
    return image, done_pix


@partial(jax.jit, static_argnames=("n_pixels",))
def _flush_jit(image, acc, done, piece_pix, n_pixels: int):
    return flush_balanced(image, acc, done, piece_pix, n_pixels)


# Small jitted helpers for the solve-path image algebra.  These MUST take
# the sample count / scale as traced ARGUMENTS: the eager forms
# (`spp * contrib0`, `image * scale`) bake the python int into the XLA
# computation, so every distinct spp triggers a fresh compile — measured
# ~10s through the remote-compile tunnel, paid INSIDE a time-budgeted
# solve (the round-2 guided_equal_time 33% overshoot with 0 guiding steps).
# Shape-keyed jit caching makes them compile once per problem size, and
# ``prepare()`` warms them outside the timed region.


@jax.jit
def _image_init_jit(in_shell0, contrib0, spp_f):
    return jnp.where(in_shell0[:, None], spp_f * contrib0, 0.0)


@jax.jit
def _scale_image_jit(image, scale):
    return image * scale[:, None]


@jax.jit
def _add_images_jit(a, b):
    return a + b


class BudgetSlicer:
    """Shared time-budget slicing for round-based persistent solves.

    Used by both ``balanced_solve`` and the guided training phase so the
    policy lives in ONE place.  With a measured steps/s rate, budgeted
    rounds keep FULL per-pixel quotas and are cut by an ITERATION CAP
    sized to fill half the remaining budget: lanes never drain their
    worklists early, so every budgeted dispatch runs in the steady-state
    ~95%-occupancy regime (per-round quota throttling measured only
    54-57% — lanes idled while stragglers finished the round's few
    samples).  Slices shrink geometrically toward the deadline, bounding
    overshoot to one minimum dispatch; uneven per-pixel completion is
    rescaled by the caller (unbiased).  The steps/s estimate is a
    per-round EMA seeded by ``rate0``.
    """

    def __init__(self, time_budget_s, start_time, rate0=None):
        self.budget = time_budget_s
        self.start = start_time
        self.rate = float(rate0) if rate0 else None
        # a caller-provided rate0 is a cross-solve prior (hint cache /
        # earlier phase) — trusted for the round-1 minimum-dispatch stop
        # test below, unlike this process's own compile-suspect round 0
        # (ADVICE r4 #1)
        self.trusted_prior = rate0 is not None
        self.slice_s = None

    def plan(self, rem, cost, round_i: int, probe_spp: int,
             have_cost: bool, n_lanes: int | None = None,
             floor: int | None = None):
        """Per-round quota decision: returns (rem_round, stop).

        Round 0 always runs at least a one-sample probe slice (a
        zero-sample image would leave unresolved pixels biased to 0).
        Without a rate — or with a rate but no per-pixel cost, where cpp
        would undercount steps by the mean walk length — the probe is
        kept minimal (its wall is unbounded either way).  With a rate,
        quotas are PROPORTIONAL to the slice's step capacity: every
        pixel's round quota is the same fraction of its remaining
        samples, sized so lanes drain their worklists at ~80% of the
        iteration cap (the cap stays as a straggler bound).  Full quotas
        cut by the cap alone completed pixels in prefix order inside
        each lane's piece list — measured harmonic-mean completion 123
        spp against a 304 arithmetic mean (and 63 zero-sample pixels)
        on the budgeted-uniform parity row, a 2.5x effective-spp
        collapse after the partial-sum rescale.  ``n_lanes``/``floor``
        let the stop test compare the remaining budget against the
        minimum dispatch wall.
        """
        import time as _time

        if self.budget is None:
            return rem, False
        remaining_s = self.budget - (_time.time() - self.start)
        if remaining_s <= 0 and round_i > 0:
            return rem, True
        if self.rate is None or (round_i == 0 and not have_cost):
            return np.minimum(rem, min(probe_spp, 2)), False
        # stop when even the minimum dispatch (floor iterations at full
        # lane width) would blow the remaining budget by more than half
        # its own wall.  Round 1 is exempt ONLY when the rate's single
        # sample is this process's own round 0, whose wall can be
        # compile-inflated 10-50x — multiplied by an oversubscribed lane
        # width that predicted a 4000s "minimum" for a 600s budget and
        # aborted the solve after the probe (round-4 regression test).
        # With a trusted cross-solve prior (rate0), the stop applies from
        # round 1: a genuinely over-budget minimum dispatch must not run
        # just because it is early (ADVICE r4 #1).  An unexempted round 1
        # stays wall-bounded by bound_cap and the caller's watchdog cap;
        # by round 2 the EMA has washed any compile wall out.
        if n_lanes and floor and (round_i > 1
                                  or (round_i == 1 and self.trusted_prior)):
            min_wall = floor * n_lanes / self.rate
            if remaining_s < 0.5 * min_wall:
                return rem, True
        self.slice_s = 0.5 * remaining_s
        cap_steps = self.slice_s * self.rate
        total_cost = float((rem * np.maximum(cost, 1.0)).sum())
        if total_cost > cap_steps:
            # oversubscribe ~1.3x the cap's step capacity so the
            # iteration cap — not lane drain — ends the round at ~full
            # occupancy (quota-drain rounds measured 63-66% while
            # stragglers idled the dispatch); the cut tail is a random
            # pixel subset each round (shuffled piece assignment), so
            # per-pixel completion stays even in expectation.  ceil
            # keeps every unresolved pixel progressing each round.
            frac = 1.3 * cap_steps / total_cost
            rem_round = np.minimum(rem, np.ceil(rem * frac)).astype(
                rem.dtype)
            return rem_round, False
        return rem, False

    def bound_cap(self, cap: int, n_lanes: int, floor: int) -> int:
        """Bound an iteration cap so the dispatch's predicted wall fits
        the slice (floor keeps committed walks able to finish).  The
        per-iteration wall model is n_lanes/rate — exact in the full-
        quota, full-occupancy regime."""
        if self.budget is None or self.rate is None or self.slice_s is None:
            return cap
        cap_t = int(self.slice_s * self.rate / max(n_lanes, 1))
        return min(cap, max(cap_t, floor))

    def update(self, steps: int, wall_s: float):
        r = steps / max(wall_s, 1e-9)
        self.rate = r if self.rate is None else 0.4 * self.rate + 0.6 * r

    def expired(self) -> bool:
        import time as _time

        return (self.budget is not None
                and _time.time() - self.start > self.budget)


def oversub_lanes(n: int, spp: int, lane_multiple: int = 1) -> int:
    """Lane OVERSUBSCRIPTION width for the balanced solve.

    The lane width is a free parameter of the balanced partition (pixels
    split across lanes), and small eval grids underfill the chip — the 3D
    slice scenes run 16k pixels against the 65-262k lanes of the 2D
    scenes, paying near-fixed dispatch wall for a quarter of the steps.
    Widen the worklist toward ELAINA_LANE_TARGET (bounded by the total
    sample count so tiny problems keep tiny dispatches; rounded to the
    mesh multiple).  Per-lane RNG streams make co-pixel lanes draw
    independent samples, so the split is unbiased by construction."""
    lane_target = int(os.environ.get("ELAINA_LANE_TARGET", str(64 * 1024)))
    if n >= lane_target:
        return n
    m = min(lane_target, n * max(int(spp), 1))
    return max((m // max(lane_multiple, 1)) * max(lane_multiple, 1), n)


def lane_cap(m: int, lane_multiple: int = 1) -> int:
    """Upper bound on the balanced-solve lane width (VERDICT r4 #4).

    Past ~384k lanes the compacted eps-shell resolve disables itself (its
    mask and lane-id buffers live in the 1 MB SMEM — see the gate in
    ``dirichlet_distance_masked``) and measured step rates drop ~40%
    (refscale: ~7M steps/s at 1024² vs ~12.5M at 512²).  Capping the
    worklist width keeps every dispatch in the compacted fast-path
    regime; the balanced partition already queues multiple pixels per
    lane, so a capped width only adds rounds, never bias.  The reference
    sizes itself the opposite way (2048² concurrent walks,
    guided/parameters.h:8) because CUDA occupancy wants oversubscription;
    on TPU the fixed-shape wavefront is already fully resident and the
    win is keeping the scalar compaction core fed.  ``ELAINA_LANE_CAP``
    overrides (0 disables)."""
    cap = int(os.environ.get("ELAINA_LANE_CAP", str(384 * 1024)))
    if cap <= 0 or m <= cap:
        return m
    lm = max(lane_multiple, 1)
    return max((cap // lm) * lm, lm)


def balanced_solve(scene, extra, pts_np, rd0_np, resolved_np, contrib0,
                   in_shell0, *, spp: int, eps: float, max_depth: int,
                   d_stack: int = 48, n_stack: int = 48, step_fn=None,
                   key=None, time_budget_s=None, start_time=None,
                   progress=None, max_rounds: int | None = None,
                   cost0=None, chunk=None, cost_sink=None, rate0=None,
                   rate_sink=None, lane_multiple: int = 1):
    """Round-based balanced persistent solve (see make_balanced_chunk).

    Round 0 runs an identity partition for a few samples to measure
    per-pixel walk cost (skipped when ``cost0`` provides estimates from an
    earlier phase); later rounds repartition the remaining samples
    into cost-balanced worklists until every pixel reaches ``spp``.
    Resolved pixels (in-shell / masked) are baked analytically.  Returns
    (image (N, 3) device [pre-normalization sum], total_steps).

    With ``time_budget_s`` set, rounds are TIME-SLICED: each round's
    quotas are capped at the per-pixel sample count predicted (from the
    measured step rate) to fill HALF the remaining budget, so every pixel
    progresses in lockstep, slices shrink geometrically toward the
    deadline, and a rate misestimate can only overshoot by the last
    slice — never by the whole budget.  ``rate0`` seeds the steps/s
    estimate (e.g. from an earlier phase on the same problem) so even the
    first slice is time-bounded.  Partial sums are rescaled by
    completed-sample counts (near-uniform).
    """
    import time as _time

    n = pts_np.shape[0]
    S = N_PIECES
    m = lane_cap(oversub_lanes(n, spp, lane_multiple), lane_multiple)
    if chunk is None:
        # pass a prebuilt chunk to share the traced/compiled program
        # across solve calls (re-creating the closure re-traces a very
        # large while_loop program: ~10s+ per call)
        chunk = make_balanced_chunk(step_fn, eps=eps, max_depth=max_depth,
                                    d_stack=d_stack, n_stack=n_stack)
    image = _image_init_jit(jnp.asarray(in_shell0), contrib0,
                            jnp.float32(spp))
    rem = np.where(resolved_np, 0, spp).astype(np.int64)
    cost = np.ones(n)
    key = pkey(3) if key is None else key
    det = deterministic()
    total_steps = 0
    start_time = start_time or _time.time()

    if max_rounds is None:
        # enough rounds to drain spp even when every round is cut at the
        # dispatch budget
        max_rounds = 8 + 4 * (1 + spp * max_depth // ITER_DISPATCH_BUDGET)
    spp_w = int(min(8, spp))
    have_cost0 = cost0 is not None
    if have_cost0:
        cost = np.maximum(np.asarray(cost0, np.float64), 1.0)
        piece_pix, piece_quota = build_balanced_pieces(rem, cost, m, S)
    else:
        piece_pix = np.zeros((S, n), np.int32)
        piece_pix[0] = np.arange(n)
        piece_quota = np.zeros((S, n), np.int32)
        piece_quota[0] = np.where(resolved_np, 0, spp_w)

    interrupted = False
    budget_mode = time_budget_s is not None
    slicer = BudgetSlicer(time_budget_s, start_time, rate0)
    shuffle_rng = np.random.default_rng(0xE1A) if budget_mode else None
    sink_steps, sink_wall, r0_rate = 0, 0.0, None
    # min measured PER-LANE per-iteration wall (watchdog bound); kept
    # per-lane so dispatches at a different width (oversubscribed rounds
    # vs the width-n probe) scale their caps with the width.  A rate prior
    # from an earlier phase seeds it so even round 0 is length-bounded
    # (1/rate is wall per lane-slot-iteration in the full-occupancy model).
    it_pl = (1.0 / float(rate0)) if (rate0 and not det) else None
    total_sam = int(np.sum(~resolved_np)) * spp
    for round_i in range(max_rounds):
        if rem.sum() == 0:
            break
        if (budget_mode and round_i > 0
                and rem.sum() < max(1, total_sam // 2000)):
            # drain-skip: a dispatch for <0.05% of the samples costs a
            # near-full-second round committing almost nothing; the
            # partial-sum rescale below is unbiased.  Budgeted solves
            # only — an unbudgeted solve declares a full protocol, so it
            # drains every sample (VERDICT r4 #9: the headline must not
            # end on an "interrupted" rescale)
            interrupted = True
            break
        rem_round, stop = slicer.plan(rem, cost, round_i, spp_w, have_cost0,
                                      n_lanes=m, floor=max_depth + 32)
        if stop:
            interrupted = True
            break
        # TIGHT per-round caps: a round run to completion idles every
        # finished lane while estimate-error stragglers drain (measured
        # ~40% occupancy); cutting at ~1.35x the balanced ideal keeps each
        # round ~90% occupied and the next repartition SPLITS straggler
        # work across many lanes.  Also bound the single-dispatch length:
        # the tunneled TPU's runtime watchdog kills (and crashes the
        # worker of) dispatches running for minutes.
        n_round = m
        if round_i == 0 and not have_cost0:
            n_round = n          # identity cost-probe partition
            cap = 64
        else:
            ideal = int(np.ceil(float((rem_round * cost).sum()) / max(m, 1)))
            # tail decisions look at the FULL remaining work: budgeted
            # rounds keep rem_round small by construction (proportional
            # quotas), and gating on the round quota made every budgeted
            # round take the quarter-width "tail" shape mid-solve
            ideal_full = int(np.ceil(float((rem * cost).sum()) / max(m, 1)))
            if ideal_full <= max_depth and m >= 4 * 32768:
                # tail rounds run a fraction of the lanes' capacity: the
                # depth step costs full-lane wall whether lanes live or
                # not, so pack the leftovers into 1/4-width lane arrays
                # (the jitted chunk retraces once per shape, cached).
                # Measured: the two tail rounds drop from ~5.5s at 8-36%
                # occupancy to ~2s at quarter width.  Under a mesh the
                # tail width must stay divisible by the mesh size
                # (lane_multiple); skip the shrink when it can't.
                n4 = (m // 4) // lane_multiple * lane_multiple
                if n4 > 0:
                    n_round = n4
                    ideal = int(np.ceil(ideal * m / n4))
            cap = min(int(1.35 * ideal) + 24, ITER_DISPATCH_BUDGET)
            if ideal_full <= max_depth:
                # final tail: give every remaining walk room to finish in
                # ONE dispatch (a cap below max_depth re-rolls every
                # deeper walk into yet another round).  The while_loop
                # exits as soon as quotas drain and all walks die, so a
                # generous cap costs little at quarter width.
                cap = min(max_depth + 2 * ideal + 64, ITER_DISPATCH_BUDGET)
        cap = slicer.bound_cap(cap, n_round, max_depth + 32)
        if det:
            # deterministic mode: caps derive only from sample counts and
            # device-computed costs — never from measured walls — so the
            # dispatch sequence (and with it every downstream RNG stream)
            # is identical across runs.  The static round-0 probe bound
            # keeps the first wide dispatch watchdog-safe.
            if round_i == 0 and n_round >= 16384:
                cap = min(cap, 8 if not have_cost0 else 64)
        elif it_pl is not None:
            # runtime-watchdog bound: a single dispatch must stay well
            # under the tunneled TPU's multi-minute kill threshold.
            # Scenes with expensive per-iteration queries (neumann3d:
            # ~1s/iter of silhouette sweeps vs ~2ms on the 2D scenes)
            # otherwise crash the WORKER mid-solve.  FLOOR 24: it_wall
            # measured from a compile- or overhead-inflated short round
            # overestimates per-iteration cost; a floor of 1 let that
            # shrink every later dispatch to a few iterations whose wall
            # is pure dispatch overhead — which kept it_wall inflated
            # and the solve in permanently tiny dispatches (bumpy3d
            # first-ever guided run: 275 s for a 13 s solve, round 4).
            # At >= 24 iterations the overhead is amortized away and the
            # next measurement recovers; true >= 2 s/iter scenes would
            # need ~48 s dispatches to exist at all, which the probe
            # round already rules out.
            cap = max(min(cap, int(45.0 / (it_pl * max(n_round, 1)))), 24)
        elif n_round >= 16384:
            # NO wall estimate of any kind (first run of this problem
            # shape, no rate hints): the very first dispatch must itself
            # survive the watchdog.  Probe-size it — neumann3d 256²'s
            # round 0 at cap 32 ran minutes of per-iteration silhouette
            # sweeps and the runtime KILLED the worker (round 4); 8
            # iterations bound that to seconds and measure it_wall for
            # every later round.  Gated on wide dispatches: the risk is
            # n_lanes x per-lane-iteration cost (22 us/lane/iter was the
            # worst measured), so small dispatches keep the full round-0
            # cap and its at-least-one-sample guarantee.
            cap = min(cap, 8)
        if (round_i > 0 or (have_cost0 and budget_mode)
                or piece_pix.shape[1] != n_round):
            piece_pix, piece_quota = build_balanced_pieces(
                rem_round, cost, n_round, S,
                shuffle=shuffle_rng if budget_mode else None)
        elif budget_mode:
            # probe round keeps the identity lane<->pixel partition (the
            # per-pixel cost measurement below divides lane steps by pixel
            # dones) but takes the sliced quota
            piece_quota = np.zeros((S, n), np.int32)
            piece_quota[0] = rem_round.astype(np.int32)
        ppos = tuple(jnp.asarray(pts_np[piece_pix, d])
                     for d in range(pts_np.shape[1]))
        prd = jnp.asarray(rd0_np[piece_pix])
        t_r = _time.time()
        acc, done, lsteps, steps, iters = chunk(
            scene, extra, ppos, prd, jnp.asarray(piece_quota),
            jax.random.fold_in(key, round_i), jnp.int32(cap))
        image, done_pix = _flush_jit(image, acc, done,
                                     jnp.asarray(piece_pix), n)
        total_steps += int(steps)
        # measured even without a budget: rate_sink shares it so later
        # budgeted solves on the same problem can slice their first round
        slicer.update(int(steps), _time.time() - t_r)
        if not det:
            iw = (_time.time() - t_r) / max(int(iters), 1) / max(n_round, 1)
            it_pl = iw if it_pl is None else min(it_pl, iw)
        if round_i > 0:
            # round 0 of a fresh process can include XLA compile wall (a
            # 10-50x underestimate); post-round-0 work is cached as a
            # cumulative steps/wall ratio so low-occupancy tail rounds
            # (few steps) cannot dominate the cached rate.  Round 0's own
            # rate is kept separately and the max wins below: a short
            # solve does ~all its work in round 0, leaving the
            # rounds-1+ ratio as pure tail dribble (see the guided
            # training phase's poisoned 0.26M/s hint).
            sink_steps += int(steps)
            sink_wall += _time.time() - t_r
        else:
            r0_rate = int(steps) / max(_time.time() - t_r, 1e-9)
        if os.environ.get("ELAINA_BALANCE_DEBUG") == "1":
            import sys as _sys
            it_n = int(iters)
            _sys.stderr.write(
                f"[balance] round {round_i}: lanes={n_round} cap={cap} "
                f"iters={it_n} steps={int(steps)} occ="
                f"{int(steps)/max(it_n*n_round,1)*100:.0f}% "
                f"rem={int(rem.sum())} wall={_time.time()-t_r:.2f}s "
                f"rate={int(steps)/max(_time.time()-t_r,1e-9)/1e6:.1f}M/s\n")
        done_np = np.asarray(done_pix).astype(np.int64)
        rem = np.maximum(rem - done_np, 0)
        if round_i == 0 and not have_cost0:
            per_lane = np.asarray(lsteps).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                c = per_lane / np.maximum(done_np, 1)
            have = done_np > 0
            fallback = float(c[have].mean()) if have.any() else 8.0
            cost = np.where(have, np.maximum(c, 1.0), max(fallback, 1.0))
            # steps spent on cap-dropped walks inflate the estimate far
            # beyond any real walk; a sample can never cost more than
            # max_depth steps
            cost = np.minimum(cost, float(max_depth))
            if cost_sink is not None:
                # share the measured per-pixel cost (load-balancing hint
                # only — correctness never depends on it) so later solves
                # on the same problem skip the unbalanced probe round
                cost_sink(cost)
        if progress is not None:
            frac_done = 1.0 - rem.sum() / max(
                float(np.sum(~resolved_np)) * spp, 1.0)
            progress(int(frac_done * 100), 100)
        if slicer.expired() and rem.sum() > 0:
            interrupted = True
            break

    if rate_sink is not None and (sink_wall > 0 or r0_rate is not None):
        cands = [r for r in
                 (sink_steps / sink_wall if sink_wall > 0 else None,
                  r0_rate) if r]
        rate_sink(max(cands))
    if interrupted or rem.sum() > 0:
        from ..core.logger import log_warning
        zero = (~resolved_np) & (rem >= spp)
        if zero.any():
            # unbiasedness floor: a pixel with ZERO completed samples
            # rescales to 0 (bias), so give each one walk room to finish
            # in one final bounded dispatch — the round-0 probe cap (8
            # iterations on never-measured scenes) can cut every walk
            # mid-flight when the budget dies before round 1.  Bounded
            # overshoot, like the probe slice itself; the watchdog bound
            # still applies through the measured it_wall.
            rem_res = np.where(zero, 1, 0).astype(rem.dtype)
            cap = max_depth + 8
            if it_pl is not None:
                cap = max(min(cap, int(45.0 / (it_pl * max(n, 1)))), 8)
            piece_pix, piece_quota = build_balanced_pieces(
                rem_res, cost, n, S)
            ppos = tuple(jnp.asarray(pts_np[piece_pix, d])
                         for d in range(pts_np.shape[1]))
            prd = jnp.asarray(rd0_np[piece_pix])
            acc, done, lsteps, steps, iters = chunk(
                scene, extra, ppos, prd, jnp.asarray(piece_quota),
                jax.random.fold_in(key, max_rounds + 1), jnp.int32(cap))
            image, done_pix = _flush_jit(image, acc, done,
                                         jnp.asarray(piece_pix), n)
            total_steps += int(steps)
            rem = np.maximum(rem - np.asarray(done_pix).astype(np.int64), 0)
        done_total = np.where(resolved_np, spp, spp - rem)
        dump = os.environ.get("ELAINA_DONE_DUMP")
        if dump:
            np.save(dump, np.where(resolved_np, -1, spp - rem))
        log_warning(
            "balanced_solve interrupted: %d/%d samples remain; rescaling "
            "partial pixel sums by completed-sample counts (unbiased in "
            "expectation, but per-pixel variance is no longer uniform)",
            int(rem.sum()), int(np.sum(~resolved_np)) * spp)
        scale = spp / np.maximum(done_total, 1)
        image = _scale_image_jit(image, jnp.asarray(scale, jnp.float32))
    return image, total_steps


def compute_step0(scene: Scene, eval_points, mask, *, eps: float,
                  d_stack: int = 48, n_stack: int = 48):
    """Evaluate the (deterministic) first-step separation once per pixel.

    Returns (rd0, in_shell0, contrib0): every sample of a pixel starts at
    the same eval point, so its step-0 closest-point query — and, for
    in-shell pixels, the ENTIRE sample (the boundary contribution with
    throughput 1) — is identical across samples.  The reference recomputes
    this per sample per pixel (generateEvaluationPoints +
    separateEvaluationPoint each spp, uniform/integrator.cu:550-563); here
    in-shell pixels are resolved analytically and never enter the walk.
    """
    state = init_walk_state(eval_points, mask)
    in_shell, R_B, bcolor, R_D = _separate(
        scene, state, eps, d_stack, shrink=True)
    in_shell &= mask
    if scene.dirichlet is not None:
        contrib0 = _boundary_term(scene, state, in_shell, bcolor)
    else:
        contrib0 = jnp.zeros((eval_points.shape[0], 3), jnp.float32)
    return R_D, in_shell, contrib0


def persistent_carry_from_step0(eval_points, mask, spp: int, in_shell0,
                                contrib0):
    """Initial carry with in-shell pixels fully pre-resolved."""
    n = eval_points.shape[0]
    state = init_walk_state(eval_points, jnp.zeros((n,), bool))
    resolved = in_shell0 | ~mask
    return (state,
            jnp.where(in_shell0[:, None], spp * contrib0, 0.0),
            jnp.where(resolved, spp, 0).astype(jnp.int32),
            jnp.zeros((n,), jnp.int32),
            jnp.int32(0))


def persistent_carry_init(eval_points, mask, spp: int):
    n = eval_points.shape[0]
    state = init_walk_state(eval_points, jnp.zeros((n,), bool))
    return (state,
            jnp.zeros((n, 3), jnp.float32),
            jnp.where(mask, 0, spp).astype(jnp.int32),
            jnp.zeros((n,), jnp.int32),
            jnp.int32(0))


def run_one_sample(scene: Scene, eval_points, mask, key, *, eps: float,
                   max_depth: int, d_stack: int = 48, n_stack: int = 48):
    """One sample-per-pixel sweep: full walk of every lane to max_depth.

    Returns the per-pixel contribution (N, 3).  The depth loop is a
    ``lax.scan`` of the fused step (reference inner loop: solveImpl 552-575).
    """
    state = init_walk_state(eval_points, mask)
    keys = jax.random.split(key, max_depth)

    # accumulate contributions in the carry: stacking per-depth (N, 3)
    # outputs would materialize a (depth, N, 3) array whose trailing dim
    # pads 3 -> 128 on TPU (a ~40x HBM blowup at production sizes)
    def body(carry, k):
        st, acc, lives = carry
        n_live = jnp.sum(st.active.astype(jnp.int32))
        st, contrib = wost_depth_step(scene, st, k, eps, d_stack, n_stack)
        return (st, acc + contrib, lives + n_live), None

    init = (state, jnp.zeros((eval_points.shape[0], 3), jnp.float32),
            jnp.int32(0))
    (_, total, lives), _ = jax.lax.scan(body, init, keys)
    return total, lives
