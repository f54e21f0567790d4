"""Adaptive candidate-grid acceleration for closest-point queries (TPU-native).

The reference's hot query — closest point on the Dirichlet boundary, once
per walk per depth (uniform/integrator.cu:138-157) — runs on GPU as a
per-thread BVH descent.  That shape (divergent per-lane stacks + random
scatter) is hostile to the TPU's lockstep vector units, so the TPU build
replaces it with an *adaptive candidate grid*:

For every cell of a grid over the query domain we precompute the exact set
of primitives that can be the nearest neighbour of ANY point in the cell:
with lower_i <= min_{q in cell} d(q, prim_i), upper_i >= max_{q in cell}
d(q, prim_i) (2D: exact box-segment bounds; 3D: center +/- half-diagonal),
the band

    {i : lower_i <= M},   M = min_j upper_j

provably contains the exact nearest primitive for every in-cell query.
Cells whose band exceeds the uniform row width K are REFINED: subdivided
2x per axis, recursively, until the band fits (bands shrink with cell
size).  All bands land as uniform K-wide rows of one flat table, so every
query lane does identical work: resolve its row id through the per-level
``meta`` indirection (1-3 tiny gathers), then sweep K candidates.

On TPU the sweep runs as a Pallas kernel: one contiguous row DMA per lane
from the pre-resolved *coordinate table* (attach_coords) plus a dense VPU
distance reduction — zero per-candidate gathers, which otherwise dominate
the whole solve (measured ~18 cycles/element through XLA's gather).

The build runs on device in cell chunks and is cached to disk keyed by a
geometry hash.  A per-(level-0)-cell lower bound of the boundary distance
(``lbound``) falls out of the build for free.
"""

from __future__ import annotations

import hashlib
import logging
import os
from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .primitives import prim_closest_point

PAD_COORD = 1.0e9  # far-away coordinate for padded candidate slots


@partial(jax.tree_util.register_dataclass,
         data_fields=["packed", "origin", "inv_cell", "r0"],
         meta_fields=["res", "s", "eps"])
@dataclass
class FinePack:
    """Dense finest-level lookup: ONE gather resolves row + need + bound.

    Every XLA TPU gather costs ~77ns per element regardless of table size,
    so the multi-level meta descent (6 gathers) + row_lbound + row_diag
    (2 more) dominated the whole depth step.  ``packed`` collapses all of
    it into one int32 per finest-level cell:

        bit  31      need flag (epsilon-shell / exactness test, baked with
                     the solve's eps) — entry < 0  <=>  need
        bits 30..20  quantized lower-bound bucket b (11 bits):
                     bound(0) = 0; bound(b) = r0 * 2^((b-1)/s)  <= true rl
        bits 19..0   candidate-table row id (requires R < 2^20)

    The bound quantizes DOWN (star radii shrink by < 2^(1/s)-1, ~1.1% at
    s=64 — still provably valid).  Sized res0 * 2^(levels-1) per axis; all
    leaf cells of every refinement depth are replicated to the finest
    level, so a query is pure arithmetic + one gather.
    """

    packed: jnp.ndarray      # (prod(res),) int32
    origin: jnp.ndarray      # (D,)
    inv_cell: jnp.ndarray    # (D,) finest cells per world unit
    r0: jnp.ndarray          # () f32 quantization base
    res: tuple               # finest resolution per axis (static)
    s: float                 # buckets per octave (static)
    eps: float = 0.0         # epsilon the need bit was baked with (static)


FINE_BUCKETS = 2047
FINE_ROW_MASK = (1 << 20) - 1


def fine_decode(fp: FinePack, q):
    """(row, need, rl, outside) for query points q (N, D) — one gather.

    In isolation a 128-cell row gather + one-hot select measures ~20%
    faster than this plain 1-D gather (tools/tpu_gather_lab.py), but inside
    the fused depth step it REGRESSES by ~2ms — XLA fuses the scalar
    gather into the surrounding program better.  Keep the 1-D form.
    """
    res = jnp.asarray([r for r in fp.res], jnp.float32)
    rel = (q - fp.origin) * fp.inv_cell
    outside = jnp.any((rel < 0.0) | (rel >= res), axis=-1)
    idx = jnp.clip(rel.astype(jnp.int32), 0,
                   jnp.asarray([r - 1 for r in fp.res], jnp.int32))
    lin = idx[..., 0]
    for d in range(1, len(fp.res)):
        lin = lin * fp.res[d] + idx[..., d]
    p = fp.packed[lin]
    need = p < 0
    pu = p & 0x7FFFFFFF
    row = pu & FINE_ROW_MASK
    b = pu >> 20
    # (1 - 2^-19) guards the f32 rounding of exp2 so bound <= true rl holds
    rl = jnp.where(b == 0, 0.0,
                   fp.r0 * jnp.exp2((b.astype(jnp.float32) - 1.0) / fp.s)
                   * (1.0 - 1.9e-6))
    return row, need, rl, outside


@partial(jax.tree_util.register_dataclass,
         data_fields=["origin", "inv_cell", "cand", "meta", "coverage",
                      "lbound", "row_lbound", "row_diag", "row_trunc",
                      "coords", "fine", "cpack", "crows"],
         meta_fields=["res", "trunc_min_rl"])
@dataclass
class CandidateGrid:
    origin: jnp.ndarray      # (D,)
    inv_cell: jnp.ndarray    # (D,) 1/cell_size at level 0
    cand: jnp.ndarray        # (R, K) int32 prim-id rows, -1 padded
    meta: tuple              # per-level int32 arrays: >=0 row id,
    #                          <0 -> -(refined-cell ordinal)-1 into level+1
    coverage: jnp.ndarray    # 1.0 if every leaf cell's band fit K
    lbound: jnp.ndarray      # (C0,) f32 min-over-cell distance lower bound
    row_lbound: jnp.ndarray  # (R,) f32 leaf-cell min-over-cell lower bound
    row_diag: jnp.ndarray    # (R,) f32 leaf-cell diameter (bound gap):
    #                          true distance <= row_lbound + row_diag
    row_trunc: jnp.ndarray | None = None
    # row_trunc: (R,) bool — band exceeded K (nearest-K kept): generic
    # closest-point queries return row_lbound there (a valid lower
    # bound) instead of the possibly-overestimating truncated sweep
    coords: jnp.ndarray | None = None
    # coords: (R, n_rows, 128) f32 — candidate corner coordinates,
    # planes at row-aligned offsets (2D: [ax | ay | bx | by]); padded
    # slots hold PAD_COORD.  Built by attach_coords for the Pallas sweep.
    fine: FinePack | None = None   # attach_fine: single-gather row resolve
    cpack: jnp.ndarray | None = None
    # cpack: (M, 8, 128) int32 candidate-id tiles, per-row stride
    # kprime_for(K), -1 padded (attach_shading; pallas_resolve winner-pid
    # extraction)
    crows: jnp.ndarray | None = None
    # crows: (2P_pad8, 128) f32 color rows [c0.rgb, 0, c1.rgb, 0, 0...]
    # per (prim, side) (attach_shading; pallas_resolve color fetch)
    res: tuple = ()          # static level-0 cell counts per axis
    trunc_min_rl: float = float("inf")
    # trunc_min_rl: static min row_lbound over truncated rows (inf if
    # none).  Lets the hot resolve path compile the truncation clamp in
    # ONLY when a truncated row could fire the FinePack need bit
    # (trunc_min_rl < ~eps): deep-interior rows sit at rl >= 4|h| far
    # above any practical eps, so the common case stays gather-free.


# --------------------------------------------------------------------------- #
# per-(cell, prim) distance bounds
# --------------------------------------------------------------------------- #


def _point_seg_d2(cx, cy, ax, ay, bx, by):
    """Squared point-segment distance on coordinate planes (broadcasting)."""
    ex, ey = bx - ax, by - ay
    wx, wy = cx - ax, cy - ay
    den = jnp.maximum(ex * ex + ey * ey, 1e-30)
    t = jnp.clip((wx * ex + wy * ey) / den, 0.0, 1.0)
    dx, dy = wx - t * ex, wy - t * ey
    return dx * dx + dy * dy


def _seg_box_overlap(ax, ay, bx, by, lox, loy, hix, hiy):
    """True where segment (a,b) intersects the axis-aligned box (slab test)."""
    def slab(a0, d0, lo0, hi0, tmin, tmax):
        degen = jnp.abs(d0) < 1e-20
        inv = 1.0 / jnp.where(degen, 1.0, d0)
        t0 = (lo0 - a0) * inv
        t1 = (hi0 - a0) * inv
        lo_t = jnp.minimum(t0, t1)
        hi_t = jnp.maximum(t0, t1)
        inside = (a0 >= lo0) & (a0 <= hi0)
        lo_t = jnp.where(degen, jnp.where(inside, -jnp.inf, jnp.inf), lo_t)
        hi_t = jnp.where(degen, jnp.where(inside, jnp.inf, -jnp.inf), hi_t)
        return jnp.maximum(tmin, lo_t), jnp.minimum(tmax, hi_t)

    dx, dy = bx - ax, by - ay
    tmin = jnp.full(jnp.broadcast_shapes(ax.shape, lox.shape), 0.0)
    tmax = jnp.full(jnp.broadcast_shapes(ax.shape, lox.shape), 1.0)
    tmin, tmax = slab(ax, dx, lox, hix, tmin, tmax)
    tmin, tmax = slab(ay, dy, loy, hiy, tmin, tmax)
    return tmin <= tmax


def _point_box_dist(px, py, lox, loy, hix, hiy):
    dx = jnp.maximum(jnp.maximum(lox - px, px - hix), 0.0)
    dy = jnp.maximum(jnp.maximum(loy - py, py - hiy), 0.0)
    return jnp.sqrt(dx * dx + dy * dy)


def _cell_prim_bounds(dim, centers, hcell, pv):
    """Per (cell, prim) distance bounds over the whole cell.

    centers: (chunk, D); hcell: (D,) half cell size; pv: tuple of dim (P, D).
    Returns (lower, upper) each (chunk, P) with
      lower <= min_{q in cell} d(q, prim) and upper >= max_{q in cell} d(q, prim).
    2D: both EXACT (box-segment distance; the max over a box of a convex
    distance function is attained at a corner).  3D: center +/- half-diag.
    """
    if dim == 2:
        a, b = pv
        ax, ay = a[None, :, 0], a[None, :, 1]            # (1, P)
        bx, by = b[None, :, 0], b[None, :, 1]
        cx, cy = centers[:, 0:1], centers[:, 1:2]        # (chunk, 1)
        hx, hy = float(hcell[0]), float(hcell[1])
        lox, hix = cx - hx, cx + hx
        loy, hiy = cy - hy, cy + hy
        d2 = [_point_seg_d2(qx, qy, ax, ay, bx, by)
              for qx, qy in ((lox, loy), (lox, hiy), (hix, loy), (hix, hiy))]
        upper = jnp.sqrt(jnp.maximum(jnp.maximum(d2[0], d2[1]),
                                     jnp.maximum(d2[2], d2[3])))
        corner_min = jnp.sqrt(jnp.minimum(jnp.minimum(d2[0], d2[1]),
                                          jnp.minimum(d2[2], d2[3])))
        d_end = jnp.minimum(_point_box_dist(ax, ay, lox, loy, hix, hiy),
                            _point_box_dist(bx, by, lox, loy, hix, hiy))
        overlap = _seg_box_overlap(ax, ay, bx, by, lox, loy, hix, hiy)
        lower = jnp.where(overlap, 0.0, jnp.minimum(corner_min, d_end))
        return lower, upper
    h = float(np.linalg.norm(np.asarray(hcell, np.float64)))
    d, _ = prim_closest_point(dim, centers[:, None, :],
                              tuple(v[None] for v in pv))
    return jnp.maximum(d - h, 0.0), d + h


# --------------------------------------------------------------------------- #
# device build passes (chunked; super-chunked dispatches keep each call
# inside the tunneled-TPU runtime watchdog while amortizing round-trips)
# --------------------------------------------------------------------------- #

_CHUNK = 256
_SC = 32


def _pad_centers(centers, chunk_cells):
    n = centers.shape[0]
    n_pad = -(-n // chunk_cells) * chunk_cells
    out = np.zeros((n_pad, centers.shape[1]), np.float32)
    out[:n] = centers
    return out


def _count_pass(pv, dim, centers, hcell):
    """(counts (n,), lcell (n,)) — band size + cell-min lower bound."""
    def one_chunk(c):
        lower, upper = _cell_prim_bounds(dim, c, hcell, pv)
        M = jnp.min(upper, axis=-1)
        in_band = lower <= M[:, None] * (1.0 + 1e-6) + 1e-9
        return jnp.sum(in_band, axis=-1), jnp.min(lower, axis=-1)

    @jax.jit
    def super_chunk(cs):
        return jax.lax.map(one_chunk, cs.reshape(_SC, _CHUNK, dim))

    n = centers.shape[0]
    sup = _SC * _CHUNK
    cp = _pad_centers(centers, sup)
    counts = np.empty((cp.shape[0],), np.int32)
    lcell = np.empty((cp.shape[0],), np.float32)
    for s in range(0, cp.shape[0], sup):
        c_s, l_s = super_chunk(jnp.asarray(cp[s:s + sup]))
        counts[s:s + sup] = np.asarray(c_s).reshape(-1)
        lcell[s:s + sup] = np.asarray(l_s).reshape(-1)
    return counts[:n], lcell[:n]


def _band_pass(pv, dim, centers, hcell, K):
    """Band rows (n, K) int32 (-1 padded, truncated at K by prim order)
    plus the per-cell min-over-cell lower bound (n,)."""
    P = pv[0].shape[0]

    def one_chunk(c):
        lower, upper = _cell_prim_bounds(dim, c, hcell, pv)
        M = jnp.min(upper, axis=-1)
        in_band = lower <= M[:, None] * (1.0 + 1e-6) + 1e-9
        rank = jnp.cumsum(in_band, axis=-1) - 1
        dest = jnp.where(in_band & (rank < K), rank, K)
        rows = jnp.broadcast_to(jnp.arange(c.shape[0])[:, None], dest.shape)
        prim_ids = jnp.broadcast_to(
            jnp.arange(P, dtype=jnp.int32)[None], dest.shape)
        out = jnp.full((c.shape[0], K + 1), -1, jnp.int32)
        out = out.at[rows, dest].set(prim_ids, mode="drop")
        return out[:, :K], jnp.min(lower, axis=-1)

    @jax.jit
    def super_chunk(cs):
        return jax.lax.map(one_chunk, cs.reshape(_SC, _CHUNK, dim))

    n = centers.shape[0]
    sup = _SC * _CHUNK
    cp = _pad_centers(centers, sup)
    rows = np.empty((cp.shape[0], K), np.int32)
    lcell = np.empty((cp.shape[0],), np.float32)
    for s in range(0, cp.shape[0], sup):
        r_s, l_s = super_chunk(jnp.asarray(cp[s:s + sup]))
        rows[s:s + sup] = np.asarray(r_s).reshape(sup, K)
        lcell[s:s + sup] = np.asarray(l_s).reshape(-1)
    return rows[:n], lcell[:n]


def _cell_centers(lo, hi, res):
    dim = len(res)
    axes = [lo[d] + (np.arange(res[d]) + 0.5) * (hi[d] - lo[d]) / res[d]
            for d in range(dim)]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.reshape(-1) for m in mesh], axis=-1).astype(np.float32)


def _children_centers(centers, hcell, dim):
    """2^dim children per cell; child ordinal bit d set <-> upper half of
    dim d (must match the fraction test in grid_row_index)."""
    offs = []
    for sub in range(2 ** dim):
        o = [(0.25 if (sub >> d) & 1 else -0.25) * 2.0 * hcell[d]
             for d in range(dim)]
        offs.append(o)
    offs = np.asarray(offs, np.float32)                  # (2^dim, D)
    out = centers[:, None, :] + offs[None]               # (n, 2^dim, D)
    return out.reshape(-1, dim)


# --------------------------------------------------------------------------- #
# build
# --------------------------------------------------------------------------- #


def build_candidate_grid(
    verts: np.ndarray,
    indices: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    K: int = 256,
    max_res: int = 2048,
    max_levels: int = 6,
    cache_dir: str | None = None,
) -> CandidateGrid:
    """Build the adaptive candidate grid (cached to disk by geometry hash).

    Level-0 resolution targets ~512 cells on the longest axis in 2D (~64 in
    3D), capped at ``max_res``; cells whose provably-exact band exceeds K
    are subdivided (up to ``max_levels`` total levels).  All bands are
    uniform K-wide rows — every query lane does identical work.
    """
    dim = indices.shape[1]
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    span = hi - lo

    # v6: deep-interior refinement cutoff + nearest-K over-K rows (v5's
    # corner-exact bounds still ground 20+ min on bumpy3d: 57k interior
    # cells subdivided through every level in the equidistant regime)
    key = hashlib.sha1(
        b"v6" + verts.tobytes() + indices.tobytes() + lo.tobytes()
        + hi.tobytes() + np.int64([K, max_res, max_levels]).tobytes()
    ).hexdigest()[:16]
    cache_path = (os.path.join(cache_dir, f"candgrid_{key}.npz")
                  if cache_dir else None)
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        meta = tuple(jnp.asarray(z[f"meta_{i}"])
                     for i in range(int(z["n_levels"])))
        # tolerate v6 caches written before row_trunc landed (same
        # build inputs; absence means no truncated rows were kept)
        rt = np.asarray(z["row_trunc"] if "row_trunc" in z
                        else np.zeros(z["row_lbound"].shape, bool))
        rlb = np.asarray(z["row_lbound"])
        return CandidateGrid(
            origin=jnp.asarray(z["origin"]),
            inv_cell=jnp.asarray(z["inv_cell"]),
            res=tuple(int(r) for r in z["res"]), cand=jnp.asarray(z["cand"]),
            meta=meta, coverage=jnp.asarray(z["coverage"]),
            lbound=jnp.asarray(z["lbound"]),
            row_lbound=jnp.asarray(rlb),
            row_diag=jnp.asarray(z["row_diag"]),
            row_trunc=jnp.asarray(rt),
            trunc_min_rl=(float(rlb[rt].min()) if rt.any()
                          else float("inf")),
        )

    base = 512 if dim == 2 else 64
    res = tuple(int(np.clip(base * span[d] / max(span), 8, max_res))
                for d in range(dim))

    pv = tuple(jnp.asarray(verts[indices[:, k]]) for k in range(dim))

    centers = _cell_centers(lo, hi, res)
    hcell = 0.5 * span / np.asarray(res, np.float64)

    metas: list[np.ndarray] = []
    row_blocks: list[np.ndarray] = []
    row_lb_blocks: list[np.ndarray] = []
    row_tr_blocks: list[np.ndarray] = []
    row_dg_blocks: list[np.ndarray] = []
    row_base = 0
    lbound = None
    coverage = 1.0

    # native C++ band passes (BVH-pruned, O(log P + band) per cell) replace
    # the O(cells x prims) device passes when the shared library is present
    # — fille's level passes drop from 192 s to seconds (VERDICT r2 #3).
    # ELAINA_NATIVE_GRID=0 forces the device path (oracle for tests).
    from .native import grid_band_full_native, grid_bands_available
    use_native = (grid_bands_available()
                  and os.environ.get("ELAINA_NATIVE_GRID", "1") == "1")

    for lvl in range(max_levels):
        nat_rows = None
        if use_native:
            counts, nat_rows, lcell = grid_band_full_native(
                verts, indices, centers, hcell, K)
        else:
            counts, lcell = _count_pass(pv, dim, centers, hcell)
        if lvl == 0:
            lbound = lcell
        last = lvl == max_levels - 1
        # DEEP cutoff (levels 0-1 only): a cell whose nearest prim is
        # >= 4 cell-norms away is in the equidistant regime (interior of
        # a closed surface) — its band stays wide no matter how far it
        # subdivides (bumpy3d: 57k over-K level-0 cells, 20+ min of
        # refinement).  Such cells keep a nearest-K TRUNCATED row
        # (see scene_build.cpp) and are flagged in ``row_trunc``: the
        # hot solve path never sweeps them (their lower bound rl
        # >= 4|h| is far above eps + diam at these coarse levels, so
        # the need bit cannot fire and rl itself is the star radius);
        # the generic closest-point path falls back to rl, a valid
        # lower bound.  Restricting to levels 0-1 keeps the
        # rl > eps + diam safety margin structural — at finer levels
        # rl ~ 4|h_l| could drop below a user eps.
        deep = ((lcell > 4.0 * np.linalg.norm(hcell)) & (counts > K)
                if lvl <= 1 and dim == 3
                else np.zeros_like(counts, bool))
        fit = ((counts <= K) | deep if not last
               else np.ones_like(counts, bool))
        trunc = counts > K if last else deep
        if trunc.any():
            coverage = 0.0
            logging.getLogger("elaina").warning(
                "candidate grid: %d %s cells keep nearest-%d truncated "
                "bands at level %d (max band %d); their queries return "
                "the cell lower bound (exact resolves never fire there)",
                int(trunc.sum()), "leaf" if last else "deep-interior",
                K, lvl, int(counts.max()))
        fit_idx = np.flatnonzero(fit)
        over_idx = np.flatnonzero(~fit)

        meta = np.empty((centers.shape[0],), np.int32)
        meta[fit_idx] = row_base + np.arange(fit_idx.shape[0], dtype=np.int32)
        meta[over_idx] = -np.arange(over_idx.shape[0], dtype=np.int32) - 1
        metas.append(meta)

        if fit_idx.shape[0]:
            if nat_rows is not None:
                rows, row_lb = nat_rows[fit_idx], lcell[fit_idx]
            else:
                rows, row_lb = _band_pass(pv, dim, centers[fit_idx], hcell, K)
            row_blocks.append(rows)
            row_lb_blocks.append(row_lb)
            row_tr_blocks.append(counts[fit_idx] > K)
            diam = np.float32(2.0 * np.linalg.norm(hcell))
            row_dg_blocks.append(np.full((rows.shape[0],), diam, np.float32))
            row_base += rows.shape[0]

        if over_idx.shape[0] == 0:
            break
        centers = _children_centers(centers[over_idx], hcell, dim)
        hcell = hcell * 0.5

    cand = (np.concatenate(row_blocks, 0) if row_blocks
            else np.full((1, K), -1, np.int32))
    row_lbound = (np.concatenate(row_lb_blocks) if row_lb_blocks
                  else np.zeros((1,), np.float32))
    row_trunc = (np.concatenate(row_tr_blocks) if row_tr_blocks
                 else np.zeros((1,), bool))
    row_diag = (np.concatenate(row_dg_blocks) if row_dg_blocks
                else np.full((1,), np.float32(np.inf)))
    inv_cell = np.asarray(res, np.float32) / np.maximum(span, 1e-20)

    grid = CandidateGrid(
        origin=jnp.asarray(lo),
        inv_cell=jnp.asarray(inv_cell),
        res=res,
        cand=jnp.asarray(cand),
        meta=tuple(jnp.asarray(m) for m in metas),
        coverage=jnp.asarray(np.float32(coverage)),
        lbound=jnp.asarray(lbound),
        row_lbound=jnp.asarray(row_lbound),
        row_diag=jnp.asarray(row_diag),
        row_trunc=jnp.asarray(row_trunc),
        trunc_min_rl=(float(row_lbound[row_trunc].min()) if row_trunc.any()
                      else float("inf")),
    )
    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        payload = {f"meta_{i}": m for i, m in enumerate(metas)}
        np.savez_compressed(
            cache_path, origin=np.asarray(lo), inv_cell=inv_cell,
            res=np.asarray(res, np.int64), cand=cand,
            n_levels=np.int64(len(metas)),
            coverage=np.float32(coverage), lbound=lbound,
            row_lbound=row_lbound, row_diag=row_diag,
            row_trunc=row_trunc, **payload,
        )
    return grid


# --------------------------------------------------------------------------- #
# Pallas coordinate table
# --------------------------------------------------------------------------- #


@partial(jax.tree_util.register_dataclass,
         data_fields=["origin", "inv_cell", "rows", "r_cap", "lbound",
                      "ent_lo", "ent_hi", "coords"],
         meta_fields=["res"])
@dataclass
class SilGrid:
    """Single-level silhouette candidate grid (TPU-native SNCH query).

    Per cell: the K nearest (by distance lower bound) entities not
    certified non-silhouette over the cell, a validity cap ``r_cap``
    (min over excluded entities' lower bounds and the certified-silhouette
    upper-bound threshold), and a lazy-skip ``lbound``.  The query returns
    min(best found, r_cap): EXACT when the true silhouette distance is
    below r_cap, a valid LOWER bound otherwise — star radii only need
    lower bounds (WoSt R_N semantics, uniform/integrator.cu:189), so
    K-truncation trades step size, never correctness.  Built natively
    (native/scene_build.cpp sil_band_rows).
    """

    origin: jnp.ndarray      # (D,)
    inv_cell: jnp.ndarray    # (D,)
    rows: jnp.ndarray        # (C, K) int32 entity ids, -1 pad
    r_cap: jnp.ndarray       # (C,) f32 (1e30 = unbounded)
    lbound: jnp.ndarray      # (C,) f32 min lower over kept entities
    ent_lo: jnp.ndarray      # (D,) entity-set bbox (out-of-grid fallback)
    ent_hi: jnp.ndarray      # (D,)
    coords: jnp.ndarray | None = None
    # coords: (C, n_rows, 128) f32 planar entity table
    # (sil_coords_from_rows) feeding the Pallas per-lane DMA sweep
    # (ops/pallas_queries.sil_band_dma); None -> gather fallback
    res: tuple = ()


@partial(jax.tree_util.register_dataclass,
         data_fields=["origin", "inv_cell", "rows", "r_cap", "lbound",
                      "ent_lo", "ent_hi", "coords"],
         meta_fields=["res"])
@dataclass
class PrimBandGrid:
    """Radius-complete K-nearest prim bands (the Neumann QUERY grid).

    Per cell: the K nearest (by distance lower bound) prims and a
    completeness cap ``r_cap`` — for any q in the cell and any radius
    R <= r_cap, EVERY prim intersecting ball(q, R) (hence any ray
    segment of length <= R from q) is in the row (scene_build.cpp
    prim_band_rows).  WoSt clamps the star radius R_B to r_cap (always
    valid: smaller star radii only cost steps), which turns the in-ball
    sampling / ray-intersect / visibility queries of one walk step into
    dense K-wide sweeps over ONE row — replacing the per-lane stack BVH
    descent that measured ~22 us/lane/step on neumann3d (TPU round 4,
    ~200x the 2D per-step cost; per-lane dynamic stacks are the
    anti-pattern every other query here was redesigned away from).
    """

    origin: jnp.ndarray      # (D,)
    inv_cell: jnp.ndarray    # (D,)
    rows: jnp.ndarray        # (C, K) int32 prim ids, -1 pad
    r_cap: jnp.ndarray       # (C,) f32 completeness radius (1e30 = all)
    lbound: jnp.ndarray      # (C,) f32 min lower over kept prims
    ent_lo: jnp.ndarray      # (D,) prim-set bbox (out-of-grid fallback)
    ent_hi: jnp.ndarray      # (D,)
    coords: jnp.ndarray | None = None
    # coords: (C, n_rows, 128) f32 planar corner table (coords_from_cand
    # layout, 9 planes in 3D) feeding the Pallas per-lane DMA sweeps
    # (ops/pallas_queries.band_ray_dma_3d / band_ball_dma_3d);
    # None -> gather fallback
    res: tuple = ()


def build_prim_band_grid(verts, indices, lo, hi, K: int = 64,
                         max_res: int = 2048,
                         cache_dir: str | None = None) -> PrimBandGrid | None:
    """Build the radius-complete prim band grid (native; None if the
    shared library is unavailable — callers fall back to the BVH path)."""
    from .native import prim_band_rows_native, prim_bands_available
    if not prim_bands_available():
        return None
    verts = np.asarray(verts, np.float32)
    indices = np.asarray(indices, np.int32)
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    span = hi - lo
    dim = verts.shape[1]

    key = hashlib.sha1(
        b"pband1" + verts.tobytes() + indices.tobytes() + lo.tobytes()
        + hi.tobytes() + np.int64([K, max_res]).tobytes()
    ).hexdigest()[:16]
    cache_path = (os.path.join(cache_dir, f"pbandgrid_{key}.npz")
                  if cache_dir else None)
    pv = verts[indices.reshape(-1)]
    ent_lo = pv.min(0)
    ent_hi = pv.max(0)

    def _coords(rows_np):
        # planar DMA corner table for the Pallas band sweeps (the gather
        # formulation pays K x 9 corner floats per lane per query through
        # XLA's random-access gather); built on device — fully derived
        # from the rows, so never cached
        if dim == 3 and (_use_pallas() or _pallas_interpret()):
            return _device_coords_from_cand(
                jnp.asarray(rows_np), jnp.asarray(verts),
                jnp.asarray(indices))
        return None

    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        return PrimBandGrid(
            origin=jnp.asarray(z["origin"]),
            inv_cell=jnp.asarray(z["inv_cell"]),
            rows=jnp.asarray(z["rows"]), r_cap=jnp.asarray(z["r_cap"]),
            lbound=jnp.asarray(z["lbound"]), ent_lo=jnp.asarray(ent_lo),
            ent_hi=jnp.asarray(ent_hi), coords=_coords(z["rows"]),
            res=tuple(int(r) for r in z["res"]))

    base = 256 if dim == 2 else 48
    res = tuple(int(np.clip(base * span[d] / max(span), 8, max_res))
                for d in range(dim))
    centers = _cell_centers(lo, hi, res)
    hcell = 0.5 * span / np.asarray(res, np.float64)
    rows, r_cap, lbound = prim_band_rows_native(
        verts, indices, centers, hcell, K)
    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez_compressed(cache_path, origin=lo,
                            inv_cell=(np.asarray(res, np.float32)
                                      / np.maximum(span, 1e-20)),
                            rows=rows, r_cap=r_cap, lbound=lbound,
                            res=np.asarray(res, np.int64))
    return PrimBandGrid(
        origin=jnp.asarray(lo),
        inv_cell=jnp.asarray(np.asarray(res, np.float32)
                             / np.maximum(span, 1e-20)),
        rows=jnp.asarray(rows), r_cap=jnp.asarray(r_cap),
        lbound=jnp.asarray(lbound), ent_lo=jnp.asarray(ent_lo),
        ent_hi=jnp.asarray(ent_hi), coords=_coords(rows), res=res)


def sil_coords_from_rows(rows: np.ndarray, p0, p1, n1, n2,
                         always) -> np.ndarray:
    """Pre-resolve silhouette-entity data into a planar row table.

    Returns (C, n_rows, 128) f32 for ops/pallas_queries.sil_band_dma:
    plane order p0.xy[z] [p1.xyz] n1.xy[z] n2.xy[z] (3*dim planes in 2D
    where entities are vertices, 4*dim in 3D where they are edges),
    plane p at sublane rows [p*rpp, (p+1)*rpp), n_rows padded to a
    multiple of 8 (DMA tile granularity).  ``always``-silhouette
    entities get n1 = 0 so the kernel's s1*s2 <= 0 test keeps them
    unconditionally; padded slots get far-away coordinates and zero
    normals (pass the sign test at a never-winning distance).
    """
    C, K = rows.shape
    p0 = np.asarray(p0, np.float32)
    dim = p0.shape[1]
    n1 = np.asarray(n1, np.float32)
    n1 = np.where(np.asarray(always, bool)[:, None], 0.0, n1)
    groups = ([p0, np.asarray(p1, np.float32), n1,
               np.asarray(n2, np.float32)] if dim == 3
              else [p0, n1, np.asarray(n2, np.float32)])
    Kp = -(-K // 128) * 128
    rpp = Kp // 128
    n_rows = -(-len(groups) * dim * rpp // 8) * 8
    out = np.zeros((C, n_rows * 128), np.float32)
    safe = np.maximum(rows, 0)
    valid = rows >= 0
    col = 0
    for gi, g in enumerate(groups):
        is_coord = gi == 0 or (dim == 3 and gi == 1)
        for d in range(dim):
            v = g[safe, d]
            out[:, col:col + K] = np.where(
                valid, v, PAD_COORD if is_coord else 0.0)
            if is_coord and Kp > K:
                out[:, col + K:col + Kp] = PAD_COORD
            col += Kp
    return out.reshape(C, n_rows, 128)


def build_silhouette_grid(p0, p1, n1, n2, always, lo, hi, K: int = 64,
                          max_res: int = 2048,
                          cache_dir: str | None = None) -> SilGrid | None:
    """Build the silhouette candidate grid (native; None if unavailable)."""
    from .native import sil_band_rows_native, sil_bands_available
    if not sil_bands_available():
        return None
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    dim = p0.shape[1]
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    span = hi - lo

    key = hashlib.sha1(
        b"sil1" + p0.tobytes() + p1.tobytes() + np.asarray(n1).tobytes()
        + np.asarray(always, np.uint8).tobytes() + lo.tobytes()
        + hi.tobytes() + np.int64([K, max_res]).tobytes()
    ).hexdigest()[:16]
    cache_path = (os.path.join(cache_dir, f"silgrid_{key}.npz")
                  if cache_dir else None)
    ent_lo = np.minimum(p0.min(0), p1.min(0))
    ent_hi = np.maximum(p0.max(0), p1.max(0))
    def _coords(rows_np):
        # planar DMA table for the Pallas sweep (the gather path measured
        # 1668 ns/lane on TPU — tools/tpu_sil_probe.py); packed at load
        # (host-side, ~1-2 s) instead of cached: the table is ~4x the
        # rows and fully derived
        if _use_pallas() or _pallas_interpret():
            return jnp.asarray(sil_coords_from_rows(
                rows_np, p0, p1, n1, n2, always))
        return None

    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        return SilGrid(
            origin=jnp.asarray(z["origin"]), inv_cell=jnp.asarray(z["inv_cell"]),
            rows=jnp.asarray(z["rows"]), r_cap=jnp.asarray(z["r_cap"]),
            lbound=jnp.asarray(z["lbound"]), ent_lo=jnp.asarray(ent_lo),
            ent_hi=jnp.asarray(ent_hi), coords=_coords(z["rows"]),
            res=tuple(int(r) for r in z["res"]))

    base = 256 if dim == 2 else 48
    res = tuple(int(np.clip(base * span[d] / max(span), 8, max_res))
                for d in range(dim))
    centers = _cell_centers(lo, hi, res)
    hcell = 0.5 * span / np.asarray(res, np.float64)
    rows, r_cap, lbound = sil_band_rows_native(
        p0, p1, n1, n2, always, centers, hcell, K)
    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez_compressed(cache_path, origin=lo,
                            inv_cell=(np.asarray(res, np.float32)
                                      / np.maximum(span, 1e-20)),
                            rows=rows, r_cap=r_cap, lbound=lbound,
                            res=np.asarray(res, np.int64))
    return SilGrid(
        origin=jnp.asarray(lo),
        inv_cell=jnp.asarray(np.asarray(res, np.float32)
                             / np.maximum(span, 1e-20)),
        rows=jnp.asarray(rows), r_cap=jnp.asarray(r_cap),
        lbound=jnp.asarray(lbound), ent_lo=jnp.asarray(ent_lo),
        ent_hi=jnp.asarray(ent_hi), coords=_coords(rows), res=res)


def coords_from_cand(cand: np.ndarray, verts: np.ndarray,
                     indices: np.ndarray) -> np.ndarray:
    """Pre-resolve candidate corner coordinates into a planar row table.

    Returns (R, n_rows, 128) f32 where plane p (2D order: ax, ay, bx, by)
    occupies sublane rows [p*Kp/128, (p+1)*Kp/128) with Kp = K rounded up
    to 128; n_rows is padded to a multiple of 8 so a single-cell slice is
    a whole (8, 128)-tiled block — the TPU DMA granularity.  Padded slots
    hold PAD_COORD.  One contiguous block DMA per lane then feeds the
    Pallas band sweep with zero per-candidate gathers.
    """
    C, K = cand.shape
    dim = indices.shape[1]
    D = verts.shape[1]
    Kp = -(-K // 128) * 128
    rpp = Kp // 128                  # sublane rows per plane
    n_rows = -(-dim * D * rpp // 8) * 8
    out = np.full((C, n_rows * 128), PAD_COORD, np.float32)
    safe = np.maximum(cand, 0)
    valid = cand >= 0
    col = 0
    for k in range(dim):
        vi = indices[safe, k]                        # (C, K)
        for d in range(D):
            p = verts[vi, d].astype(np.float32)
            out[:, col:col + K] = np.where(valid, p, PAD_COORD)
            col += Kp
    return out.reshape(C, n_rows, 128)


@partial(jax.jit, donate_argnums=(), static_argnames=("chunks",))
def _device_coords_from_cand(cand, verts, indices, chunks: int = 8):
    """coords_from_cand computed on device (same layout, same padding).

    The host version downloads the (R, K) candidate table, fills a ~4x
    larger f32 table in numpy, and uploads it — ~280 s through this
    environment's tunneled TPU at production sizes.  On device it's a
    handful of gathers feeding HBM directly.  Chunked over rows to bound
    the intermediate (R, K) gather footprints.
    """
    C, K = cand.shape
    dim = indices.shape[1]
    D = verts.shape[1]
    Kp = -(-K // 128) * 128
    rpp = Kp // 128
    n_rows = -(-dim * D * rpp // 8) * 8

    c_pad = -(-C // chunks) * chunks
    cand_p = jnp.full((c_pad, K), -1, jnp.int32).at[:C].set(cand)

    def one(c_chunk):
        safe = jnp.maximum(c_chunk, 0)
        valid = c_chunk >= 0
        planes = []
        for k in range(dim):
            vi = indices[:, k][safe]                     # (c, K)
            for d in range(D):
                p = jnp.where(valid, verts[:, d][vi], PAD_COORD)
                if Kp != K:
                    p = jnp.pad(p, ((0, 0), (0, Kp - K)),
                                constant_values=PAD_COORD)
                planes.append(p.reshape(-1, rpp, 128))
        out = jnp.concatenate(planes, axis=1)            # (c, dim*D*rpp, 128)
        if out.shape[1] != n_rows:
            out = jnp.pad(out, ((0, 0), (0, n_rows - out.shape[1]), (0, 0)),
                          constant_values=PAD_COORD)
        return out

    out = jax.lax.map(one, cand_p.reshape(chunks, c_pad // chunks, K))
    return out.reshape(c_pad, n_rows, 128)[:C]


_COORDS_BYTES_CAP = 6 << 30   # coords table HBM cap (v5e has 16 GB)


def attach_coords(grid: CandidateGrid, verts: np.ndarray,
                  indices: np.ndarray) -> CandidateGrid:
    """Return a copy of the grid with the Pallas coordinate table attached.

    Skipped (returns the grid unchanged) when the table would not fit
    HBM — queries then use the gather path instead of the Pallas sweep."""
    if grid.coords is not None:
        return grid
    R, K = grid.cand.shape
    dim = indices.shape[1]
    Kp = -(-K // 128) * 128
    n_rows = -(-dim * verts.shape[1] * (Kp // 128) // 8) * 8
    if R * n_rows * 128 * 4 > _COORDS_BYTES_CAP:
        logging.getLogger("elaina").warning(
            "coords table would need %.1f GB (%d rows): skipping the "
            "Pallas fast path for this grid",
            R * n_rows * 128 * 4 / 2**30, R)
        return grid
    coords = _device_coords_from_cand(grid.cand, jnp.asarray(verts),
                                      jnp.asarray(indices))
    return replace(grid, coords=coords)


@partial(jax.jit, static_argnames=("kp",))
def _pack_cand(cand, kp: int):
    """(R, K) int32 -> (M, 8, 128) tiles with per-row stride kp, -1 pad."""
    R, K = cand.shape
    if kp != K:
        cand = jnp.pad(cand, ((0, 0), (0, kp - K)), constant_values=-1)
    flat = cand.reshape(-1)
    total = -(-flat.shape[0] // 1024) * 1024
    if total != flat.shape[0]:
        flat = jnp.pad(flat, (0, total - flat.shape[0]), constant_values=-1)
    return flat.reshape(-1, 8, 128)


def attach_shading(grid: CandidateGrid, colors: np.ndarray,
                   indices: np.ndarray) -> CandidateGrid:
    """Attach the pallas_resolve fetch tables: candidate-id tiles
    (winner-pid extraction in the sweep kernel) and per-(prim, side)
    corner color rows in a (2P_pad8, 128) layout so one 8-row-aligned DMA
    covers any row (computeSurfaceColor data,
    integrator/common.h:242-260).  Row layout: [c0.rgb, 0, c1.rgb, 0]
    for segments; [ca.rgb, 0, cb.rgb, 0, cc.rgb, 0] for triangles."""
    from ..ops.pallas_resolve import kprime_for
    if grid.crows is not None:
        return grid
    colors = np.asarray(colors, np.float32)
    indices = np.asarray(indices)
    P, corners = indices.shape
    rows = -(-2 * P // 8) * 8
    cr = np.zeros((rows, 128), np.float32)
    for side in range(2):
        for k in range(corners):
            cr[side:2 * P:2, 4 * k:4 * k + 3] = colors[indices[:, k], side]
    return replace(grid,
                   cpack=_pack_cand(grid.cand,
                                    kprime_for(grid.cand.shape[1])),
                   crows=jnp.asarray(cr))


# --------------------------------------------------------------------------- #
# dense finest-level packed table (FinePack)
# --------------------------------------------------------------------------- #

_PTR_BUCKET = FINE_BUCKETS            # bucket 2047 marks a pointer entry
_GE_CELL_CAP = 20_000_000             # gather-expansion size cap
_FINE_CELL_CAP = 300_000_000          # dense finest-grid cap (1.2 GB int32;
#                                       ladybug's 2D pack is 16384^2 = 268M)


def _meta_coords_np(metas: list[np.ndarray], res0) -> list[np.ndarray]:
    """Per-level integer cell coords (n_l, D) of every meta entry (host).

    Level 0 coords are the dense grid; a level-(l+1) entry e descends from
    the level-l entry holding pointer ordinal e//4, with child offset bits
    (sub & 1, sub >> 1) matching grid_row_index's fraction test.
    """
    dim = len(res0)
    coords = [np.stack(np.meshgrid(*[np.arange(r) for r in res0],
                                   indexing="ij"),
                       -1).reshape(-1, dim).astype(np.int64)]
    for lvl in range(1, len(metas)):
        prev = metas[lvl - 1]
        neg = np.flatnonzero(prev < 0)
        parent_of_ord = np.empty(neg.shape[0], np.int64)
        parent_of_ord[-prev[neg] - 1] = neg
        e = np.arange(metas[lvl].shape[0], dtype=np.int64)
        parent = coords[lvl - 1][parent_of_ord[e >> dim]]
        sub = e & (2 ** dim - 1)
        off = np.stack([(sub >> d) & 1 for d in range(dim)], -1)
        coords.append(parent * 2 + off)
    return coords


def build_fine_pack(grid: CandidateGrid, eps: float,
                    s: float = 64.0) -> FinePack | None:
    """Expand the refinement chain into the dense finest-level packed table.

    Device plan (all sizes for ladybug, res0 512^2, 6 levels, fine 16384^2):
      1. rewrite meta leaves to packed values, pointers to bucket-2047
         entries (1M-element gathers),
      2. gather-expand levels while the dense grid stays under ~20M cells
         (~21M gathered elements, ~2s),
      3. broadcast-repeat to the finest resolution (pure layout, no gather),
      4. scatter the deeper levels' leaf blocks at host-derived coords
         (~200k scattered values).
    """
    dim = len(grid.res)
    if dim not in (2, 3) or grid.cand.shape[0] > FINE_ROW_MASK:
        return None
    # pointer ordinals share the 20-bit row field: a gather-expanded level
    # with more pointer entries than it can address would silently corrupt
    # the bucket-2047 marker — fall back to the meta-descent path instead
    if any(int((np.asarray(m) < 0).sum()) > FINE_ROW_MASK for m in grid.meta):
        return None
    L = len(grid.meta)
    res0 = grid.res
    nchild = 2 ** dim
    fine_res = tuple(r << (L - 1) for r in res0)
    if int(np.prod(fine_res)) > _FINE_CELL_CAP:
        # dense finest grid would not fit (deep 3D refinements): the
        # meta-descent path stays available
        return None

    ge = 0
    cells = int(np.prod(res0))
    while ge + 1 < L and cells * nchild <= _GE_CELL_CAP:
        ge += 1
        cells *= nchild

    # host-side: fine-grid scatter targets of the deep levels' leaf blocks
    deep_lin, deep_src = [], []
    if ge + 1 < L:
        metas_np = [np.asarray(m) for m in grid.meta]
        coords = _meta_coords_np(metas_np, res0)
        for lvl in range(ge + 1, L):
            idx = np.flatnonzero(metas_np[lvl] >= 0)
            if idx.size == 0:
                continue
            c = coords[lvl][idx]
            blk = 1 << (L - 1 - lvl)
            for off in np.ndindex(*([blk] * dim)):
                lin = c[:, 0] * blk + off[0]
                for d in range(1, dim):
                    lin = lin * fine_res[d] + c[:, d] * blk + off[d]
                deep_lin.append(lin)
                deep_src.append(metas_np[lvl][idx])  # row ids (>= 0)
    # ---- pow2 bucketing of every data-dependent shape ------------------ #
    # The fused build program below is keyed on (res0, L) and the SHAPES of
    # meta levels / row tables / deep-scatter lists.  Raw shapes are
    # data-dependent, so every new scene recompiled the whole program —
    # 267 s through the remote-compile tunnel on the fille cold start.
    # Padding each to the next power of two makes the executable reusable
    # across scenes (same res/levels -> at most a handful of variants).
    def _pow2(n: int) -> int:
        return 1 << max(int(n) - 1, 0).bit_length()

    if deep_lin:
        deep_lin = np.concatenate(deep_lin).astype(np.int32)
        deep_src = np.concatenate(deep_src).astype(np.int32)
    else:
        deep_lin = np.zeros((0,), np.int32)
        deep_src = np.zeros((0,), np.int32)
    n_deep = deep_lin.shape[0]
    pad_deep = _pow2(n_deep) if n_deep else 0
    oob = np.int64(np.prod(fine_res))        # mode="drop" discards these
    deep_lin = jnp.asarray(np.pad(deep_lin, (0, pad_deep - n_deep),
                                  constant_values=oob)
                           if n_deep else deep_lin, jnp.int32)
    deep_src = jnp.asarray(np.pad(deep_src, (0, pad_deep - n_deep))
                           if n_deep else deep_src, jnp.int32)

    n_rows = grid.row_lbound.shape[0]
    pad_rows = _pow2(n_rows)
    # pad with a LARGE FINITE bound: +inf maps to 1.0 inside the r0 min
    # (the build's non-finite fallback) and would corrupt r0
    row_lb_p = jnp.concatenate(
        [grid.row_lbound,
         jnp.full((pad_rows - n_rows,), 1e30, jnp.float32)])
    meta_p = [grid.meta[0]]                  # level 0 is res0-shaped
    for m in grid.meta[1:]:
        pm = _pow2(m.shape[0])
        # pad entries are unreferenced (no pointer targets them): leaf row 0
        meta_p.append(jnp.concatenate(
            [m, jnp.zeros((pm - m.shape[0],), m.dtype)]))

    def is_ptr(v):
        return ((v >> 20) & 0x7FF) == _PTR_BUCKET

    # ONE jitted program for the whole device build: each eager op costs a
    # ~0.5-1s dispatch round-trip through the tunneled chip, and the naive
    # stack-based 2x2 interleave pads its minor dim 2 -> 128 lanes (a 64x
    # relayout that alone took ~70s).
    @partial(jax.jit, static_argnames=())
    def build(row_lbound, row_diag, meta, eps, deep_lin, deep_src):
        rl = row_lbound
        rl_pos = jnp.where(rl > 0, rl, jnp.inf)
        r0 = jnp.maximum(
            jnp.min(jnp.where(jnp.isfinite(rl_pos), rl_pos, 1.0)), 1e-12)
        b = jnp.where(
            rl <= r0, 0,
            jnp.floor(jnp.log2(jnp.maximum(rl, r0) / r0) * s).astype(
                jnp.int32) + 1)
        b = jnp.where(jnp.isfinite(rl), jnp.clip(b, 0, _PTR_BUCKET - 1),
                      _PTR_BUCKET - 1)
        # rl is a LOWER bound on the true distance everywhere in the leaf
        # cell, so a (decoded, quantized) bound >= eps proves the lane is
        # out of the shell and the (near-exact at this resolution: diam
        # ~6% of eps) bound is a valid star radius — no exact resolve
        # required.  Baking `bound < eps` instead of round 1's
        # `rl < eps + diam` shrinks the per-lane-DMA sweep set to the
        # lanes that can actually terminate.  The decoded form (what
        # fine_decode returns for non-need lanes) keeps the invariant
        # that every returned non-exact bound is >= eps.
        rl_dec = jnp.where(
            b == 0, 0.0,
            r0 * jnp.exp2((b.astype(jnp.float32) - 1.0) / s)
            * (1.0 - 1.9e-6))
        need = rl_dec < eps
        rows = jnp.arange(rl.shape[0], dtype=jnp.int32)
        packed0 = rows | (b << 20) | jnp.where(need, jnp.int32(-2**31), 0)

        def rewrite(m):
            leaf = packed0[jnp.maximum(m, 0)]
            ptr = (jnp.int32(_PTR_BUCKET) << 20) | (-m - 1)
            return jnp.where(m >= 0, leaf, ptr)

        metp = [rewrite(m) for m in meta]

        # tiling-safe 2x interleaves: only ever stack along axis 1 of a
        # rank-2 array ((A, 2, B) pads 2 -> 8 sublanes, a bounded 4x);
        # stacking a trailing axis would pad 2 -> 128 lanes
        def rowileave(a, bb):
            return jnp.stack([a, bb], 1).reshape(a.shape[0] * 2, a.shape[1])

        def colileave(a, bb):
            return rowileave(a.T, bb.T).T

        def interleave(kids, shape):
            """2^dim children -> one 2x-per-axis finer grid, innermost axis
            first.  Child ordinal bit d <-> upper half of dim d, and a
            rank-2 rowileave on a (prefix, suffix)-folded view interleaves
            exactly the folded axis (C-order linearization)."""
            sh = list(shape)
            for d in reversed(range(dim)):
                if d == dim - 1:
                    # innermost axis: interleave columns of a
                    # (prefix, sh[-1]) view (keeps the minor dim wide)
                    view = (int(np.prod(sh[:d])), sh[d])
                else:
                    view = (int(np.prod(sh[:d + 1])),
                            int(np.prod(sh[d + 1:])))
                merged = []
                for s in range(2 ** d):
                    a = kids[s].reshape(view)
                    bb = kids[s | (1 << d)].reshape(view)
                    merged.append(colileave(a, bb) if d == dim - 1
                                  else rowileave(a, bb))
                kids = merged
                sh[d] *= 2
            return kids[0].reshape(sh)

        cur = metp[0].reshape(res0)
        for lvl in range(1, ge + 1):
            nxt = metp[lvl]
            ptr = jnp.where(is_ptr(cur), cur & FINE_ROW_MASK, 0)
            kids = [jnp.where(is_ptr(cur), nxt[ptr * nchild + sub], cur)
                    for sub in range(nchild)]
            cur = interleave(kids, cur.shape)

        rep = 1 << (L - 1 - ge)
        if rep > 1:
            def rep0(a):
                return jnp.broadcast_to(
                    a[:, None, :], (a.shape[0], rep, a.shape[1])
                ).reshape(a.shape[0] * rep, a.shape[1])

            sh = list(cur.shape)
            for d in reversed(range(dim)):
                if d == dim - 1:
                    v = cur.reshape(int(np.prod(sh[:d])), sh[d])
                    cur = rep0(v.T).T
                else:
                    v = cur.reshape(int(np.prod(sh[:d + 1])),
                                    int(np.prod(sh[d + 1:])))
                    cur = rep0(v)
                sh[d] *= rep
                cur = cur.reshape(sh)
        fine = cur.reshape(-1)
        if deep_src.shape[0]:
            # padded scatter slots carry an out-of-bounds index: drop them
            fine = fine.at[deep_lin].set(packed0[deep_src], mode="drop")
        return fine, r0

    fine, r0 = build(row_lb_p, grid.row_diag, meta_p,
                     jnp.float32(eps), deep_lin, deep_src)

    inv_cell_fine = grid.inv_cell * float(1 << (L - 1))
    return FinePack(packed=fine, origin=grid.origin, inv_cell=inv_cell_fine,
                    r0=r0, res=fine_res, s=float(s), eps=float(eps))


def attach_fine(grid: CandidateGrid, eps: float) -> CandidateGrid:
    """Return a copy of the grid with the FinePack attached (2D and 3D,
    subject to build_fine_pack's dense-cell caps)."""
    if grid.fine is not None and grid.fine.eps == float(eps):
        return grid
    fp = build_fine_pack(grid, eps)
    return grid if fp is None else replace(grid, fine=fp)


# --------------------------------------------------------------------------- #
# queries
# --------------------------------------------------------------------------- #


def grid_cell_index(grid: CandidateGrid, q):
    """Level-0 linear cell index for query points (clamped to the grid)."""
    rel = (q - grid.origin) * grid.inv_cell
    dim = len(grid.res)
    idx = jnp.clip(rel.astype(jnp.int32), 0,
                   jnp.asarray([r - 1 for r in grid.res], jnp.int32))
    lin = idx[..., 0]
    for d in range(1, dim):
        lin = lin * grid.res[d] + idx[..., d]
    return lin


def grid_row_index(grid: CandidateGrid, q):
    """Resolve each query's candidate-table row through the refinement
    levels (1 tiny gather per level)."""
    dim = len(grid.res)
    rel = (q - grid.origin) * grid.inv_cell
    idx = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0,
                   jnp.asarray([r - 1 for r in grid.res], jnp.int32))
    lin = idx[..., 0]
    for d in range(1, dim):
        lin = lin * grid.res[d] + idx[..., d]
    frac = jnp.clip(rel - idx.astype(rel.dtype), 0.0, 1.0 - 1e-7)

    row = grid.meta[0][lin]
    for lvl in range(1, len(grid.meta)):
        need = row < 0
        bits = (frac >= 0.5)
        sub = bits[..., 0].astype(jnp.int32)
        for d in range(1, dim):
            sub = sub + (bits[..., d].astype(jnp.int32) << d)
        child = (-row - 1) * (2 ** dim) + sub
        child = jnp.clip(child, 0, grid.meta[lvl].shape[0] - 1)
        row = jnp.where(need, grid.meta[lvl][child], row)
        frac = jnp.where(frac >= 0.5, frac * 2.0 - 1.0, frac * 2.0)
    return jnp.maximum(row, 0)


def _use_pallas() -> bool:
    import jax as _jax
    return (os.environ.get("ELAINA_PALLAS", "1") == "1"
            and _jax.default_backend() == "tpu")


def _pallas_interpret() -> bool:
    """Force the Pallas path in interpret mode (CPU tests of the kernel)."""
    return os.environ.get("ELAINA_PALLAS_INTERPRET", "0") == "1"


def grid_closest_point(grid: CandidateGrid, verts, indices, q, need=None,
                       row=None):
    """Exact closest point via the adaptive candidate grid.

    q: (N, D) -> (dist (N,), prim_id (N,)).  Exact for in-grid queries
    whenever every leaf band fit K (grid.coverage == 1); out-of-grid
    queries use the clamped border cell's candidates.

    ``need`` (optional bool (N,)): lanes with need=False may return garbage
    — on the Pallas path their row DMA is skipped entirely, which is the
    main throughput lever (the hardware's scattered-row fetch rate is the
    solve's floor).  ``row`` (optional) reuses a precomputed
    grid_row_index.

    When the coordinate table is attached (attach_coords) and the backend
    is TPU, the band sweep runs as a per-lane-DMA Pallas kernel
    (ops/pallas_queries.grid_band_dma_2d); ELAINA_PALLAS=0 opts out.
    """
    d, pid, _ = grid_closest_point_detail(grid, verts, indices, q, need, row)
    return d, pid


def grid_closest_point_detail(grid: CandidateGrid, verts, indices, q,
                              need=None, row=None):
    """grid_closest_point plus the winning primitive's corner coordinates
    (tuple of dim arrays (N, D)) — on the Pallas path these come straight
    out of the kernel, so shell classification needs zero vertex gathers."""
    dim = indices.shape[1]
    K = grid.cand.shape[1]
    if row is None:
        row = grid_row_index(grid, q)

    if (grid.coords is not None and dim in (2, 3)
            and (_use_pallas() or _pallas_interpret())):
        rpp = -(-K // 128)
        row_m = row if need is None else jnp.where(need, row, -1)
        if dim == 2:
            from ..ops.pallas_queries import grid_band_dma_2d
            d2, slot, (ax, ay, bx, by) = grid_band_dma_2d(
                row_m, q, grid.coords, rpp, interpret=_pallas_interpret())
            pv = (jnp.stack([ax, ay], -1), jnp.stack([bx, by], -1))
        else:
            from ..ops.pallas_queries import grid_band_dma_3d
            d2, slot, c9 = grid_band_dma_3d(
                row_m, q, grid.coords, rpp, interpret=_pallas_interpret())
            pv = tuple(jnp.stack(c9[3 * k:3 * k + 3], -1) for k in range(3))
        best_i = grid.cand[row, jnp.minimum(slot, K - 1)]
        return _trunc_fallback(grid, row, jnp.sqrt(d2)), \
            jnp.maximum(best_i, 0), pv
    d, pid = _grid_closest_point_xla(grid, verts, indices, q, row)
    safe = jnp.maximum(pid, 0)
    idx = indices[safe]
    pv = tuple(verts[idx[..., k]] for k in range(dim))
    return _trunc_fallback(grid, row, d), pid, pv


def _trunc_fallback(grid: CandidateGrid, row, d):
    """Truncated (over-K, nearest-K kept) rows: the sweep's min over a
    SUBSET can overestimate the true distance, which would break the
    ball-emptiness a star radius needs — return the cell's lower bound
    there instead (valid, conservative).  Such cells sit >= 4 cell-norms
    from the surface (deep cutoff) or are max-level leaves; the hot
    solve path never reaches this: its need bit cannot fire there."""
    if grid.row_trunc is None:
        return d
    return jnp.where(grid.row_trunc[row], grid.row_lbound[row], d)


def _grid_closest_point_xla(grid: CandidateGrid, verts, indices, q, row):
    dim = indices.shape[1]
    K = grid.cand.shape[1]

    def band_slice(k0, kc):
        cand = jax.lax.dynamic_slice_in_dim(grid.cand, k0, kc, 1)[row]
        safe = jnp.maximum(cand, 0)
        idx = indices[safe]                                  # (N, kc, dim)
        pv = tuple(verts[idx[..., k]] for k in range(dim))   # (N, kc, D)
        return cand, pv

    if K <= 128:
        cand, pv = band_slice(0, K)
        if dim == 2 and _use_pallas():
            from ..ops.pallas_queries import candidate_band_pallas
            best_d, slot = candidate_band_pallas(
                q, pv[0][..., 0], pv[0][..., 1], pv[1][..., 0], pv[1][..., 1],
                cand >= 0)
            best_i = jnp.take_along_axis(cand, slot[:, None], axis=-1)[:, 0]
            return best_d, best_i
        d, _ = prim_closest_point(dim, q[:, None, :], pv)
        d = jnp.where(cand >= 0, d, jnp.inf)
        j = jnp.argmin(d, axis=-1)
        best_d = jnp.take_along_axis(d, j[:, None], axis=-1)[:, 0]
        best_i = jnp.take_along_axis(cand, j[:, None], axis=-1)[:, 0]
        return best_d, best_i

    # Wide bands: sweep the candidate axis in fixed slices, with all gathers
    # coordinate-planar — each materialized array is (N, KC), which tiles
    # the TPU's (8, 128) layout perfectly.  Gathering (N, KC, D) instead
    # pads the trailing D=2/3 to 128 lanes (a 40-64x HBM blowup that OOMs
    # compiles at production lane counts).
    KC = 128
    n_chunks = K // KC
    qc = tuple(q[:, d:d + 1] for d in range(dim))            # (N, 1) planes
    vert_planes = tuple(verts[:, d] for d in range(dim))     # (V,) planes
    idx_planes = tuple(indices[:, k] for k in range(indices.shape[1]))

    def body(i, carry):
        best_d2, best_i = carry
        cand = jax.lax.dynamic_slice_in_dim(grid.cand, i * KC, KC, 1)[row]
        safe = jnp.maximum(cand, 0)
        corner = [[vert_planes[d][idx_planes[k][safe]] for d in range(dim)]
                  for k in range(len(idx_planes))]           # [vert][dim](N, KC)
        if dim == 2:
            (ax, ay), (bx, by) = corner
            ex, ey = bx - ax, by - ay
            wx, wy = qc[0] - ax, qc[1] - ay
            den = jnp.maximum(ex * ex + ey * ey, 1e-30)
            t = jnp.clip((wx * ex + wy * ey) / den, 0.0, 1.0)
            dx, dy = wx - t * ex, wy - t * ey
            d2 = dx * dx + dy * dy
        else:
            d2 = _tri_planar_d2(qc, corner)
        d2 = jnp.where(cand >= 0, d2, jnp.inf)
        j = jnp.argmin(d2, axis=-1)
        d_c = jnp.take_along_axis(d2, j[:, None], axis=-1)[:, 0]
        i_c = jnp.take_along_axis(cand, j[:, None], axis=-1)[:, 0]
        better = d_c < best_d2
        return (jnp.where(better, d_c, best_d2),
                jnp.where(better, i_c, best_i))

    init = (jnp.full(q.shape[:1], jnp.inf), jnp.zeros(q.shape[:1], jnp.int32))
    best_d2, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    return jnp.sqrt(best_d2), best_i


def _tri_planar_d2(qc, corner):
    """Squared point-triangle distance on coordinate planes (all (N, KC))."""
    a, b, c = corner

    def sub(u, v):
        return tuple(ui - vi for ui, vi in zip(u, v))

    def dot3(u, v):
        return sum(ui * vi for ui, vi in zip(u, v))

    e1 = sub(b, a)
    e2 = sub(c, a)
    w = sub(qc, a)
    d11 = dot3(e1, e1)
    d12 = dot3(e1, e2)
    d22 = dot3(e2, e2)
    w1 = dot3(w, e1)
    w2 = dot3(w, e2)
    den = jnp.maximum(d11 * d22 - d12 * d12, 1e-30)
    u = (d22 * w1 - d12 * w2) / den
    v = (d11 * w2 - d12 * w1) / den
    inside = (u >= 0) & (v >= 0) & (u + v <= 1)
    # interior distance via the explicit residual (no cancellation)
    diff = tuple(wi - u * e1i - v * e2i for wi, e1i, e2i in zip(w, e1, e2))
    d2_in = dot3(diff, diff)

    def edge_d2(p0, p1):
        e = sub(p1, p0)
        wp = sub(qc, p0)
        t = jnp.clip(dot3(wp, e) / jnp.maximum(dot3(e, e), 1e-30), 0.0, 1.0)
        diff = tuple(wi - t * ei for wi, ei in zip(wp, e))
        return dot3(diff, diff)

    d2_edge = jnp.minimum(jnp.minimum(edge_d2(a, b), edge_d2(b, c)),
                          edge_d2(c, a))
    return jnp.where(inside, d2_in, d2_edge)
