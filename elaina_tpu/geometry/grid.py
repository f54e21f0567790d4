"""Candidate-grid acceleration for closest-point queries (TPU-native).

The reference's hot query — closest point on the Dirichlet boundary, once
per walk per depth (uniform/integrator.cu:138-157) — runs on GPU as a
per-thread BVH descent.  That shape (divergent per-lane stacks + random
scatter) is hostile to the TPU's lockstep vector units, so the TPU build
replaces it with a *candidate grid*:

For every cell of a uniform grid over the query domain we precompute the
set of primitives that can be the nearest neighbour of ANY point in that
cell.  With c = cell center, h = half-diagonal, m = min_j d(c, prim_j):

    for q in cell:  d(q, nearest) <= m + h   and
    the true nearest k satisfies d(c, k) <= d(q, k) + h <= m + 2h,

so the band {i : d(c, i) <= m + 2h} provably contains the exact nearest
primitive for every in-cell query.  A query is then one cell lookup + K
primitive evaluations — a single fused gather + dense reduce, no control
flow.  K is measured at build time; the resolution is raised until the band
fits the requested K (or the largest configured resolution is reached).

The grid is built on device in cell chunks (distance matrix + top_k), costs
seconds once per scene, and is cached to disk keyed by a geometry hash.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .primitives import prim_closest_point


@partial(jax.tree_util.register_dataclass,
         data_fields=["origin", "inv_cell", "cand", "coverage"],
         meta_fields=["res"])
@dataclass
class CandidateGrid:
    origin: jnp.ndarray      # (D,)
    inv_cell: jnp.ndarray    # (D,) 1/cell_size
    cand: jnp.ndarray        # (C, K) int32 prim ids, -1 padded
    coverage: jnp.ndarray    # 1.0 if every cell's band fit K (diagnostic)
    res: tuple               # static cell counts per axis


def _cell_centers(lo, hi, res):
    dim = len(res)
    axes = [lo[d] + (np.arange(res[d]) + 0.5) * (hi[d] - lo[d]) / res[d] for d in range(dim)]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.reshape(-1) for m in mesh], axis=-1).astype(np.float32)


def _build_at_res(verts, indices, lo, hi, res, K, chunk=512):
    """Returns (cand (C,K) int32, max_band_count)."""
    dim = indices.shape[1]
    centers = _cell_centers(lo, hi, res)
    C = centers.shape[0]
    h = 0.5 * float(np.linalg.norm((hi - lo) / np.asarray(res, np.float64)))

    pv = tuple(jnp.asarray(verts[indices[:, k]]) for k in range(dim))

    P = indices.shape[0]

    def one_chunk(c):
        # (chunk, P) exact distances from cell centers to primitives
        d, _ = prim_closest_point(dim, c[:, None, :], tuple(v[None] for v in pv))
        m = jnp.min(d, axis=-1)
        thresh = m + 2.0 * h
        in_band = d <= thresh[:, None]
        count = jnp.sum(in_band, axis=-1)
        # band compaction without sort/top_k (top_k's unrolled comparator
        # network explodes XLA compile time for K > ~16): rank in-band prims
        # by prefix count and scatter their ids into the first K slots.
        rank = jnp.cumsum(in_band, axis=-1) - 1                 # (chunk, P)
        dest = jnp.where(in_band & (rank < K), rank, K)         # K = trash
        rows = jnp.broadcast_to(jnp.arange(c.shape[0])[:, None], dest.shape)
        prim_ids = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], dest.shape)
        out = jnp.full((c.shape[0], K + 1), -1, jnp.int32)
        out = out.at[rows, dest].set(prim_ids, mode="drop")
        return out[:, :K], count

    # super-chunked dispatches: each jit call runs a lax.map over SC chunks
    # (one dispatch for everything trips TPU-runtime execution watchdogs;
    # per-chunk dispatches drown in tunnel round-trips — this is the middle)
    SC = 32
    super_cells = SC * chunk
    C_pad = -(-C // super_cells) * super_cells
    centers_pad = np.zeros((C_pad, dim), np.float32)
    centers_pad[:C] = centers

    @jax.jit
    def build_super(cs):
        return jax.lax.map(one_chunk, cs.reshape(SC, chunk, dim))

    cand = np.empty((C_pad, K), np.int32)
    max_count = 0
    for s in range(0, C_pad, super_cells):
        idx_s, count_s = build_super(jnp.asarray(centers_pad[s:s + super_cells]))
        cand[s:s + super_cells] = np.asarray(idx_s).reshape(super_cells, K)
        max_count = max(max_count, int(np.max(np.asarray(count_s))))
    return cand[:C], max_count


def _count_at_res(verts, indices, lo, hi, res, chunk=512):
    """Max band count at a resolution — probe pass, no candidate arrays.

    One compilation serves every resolution (shapes depend only on chunk
    and the primitive count)."""
    dim = indices.shape[1]
    centers = _cell_centers(lo, hi, res)
    C = centers.shape[0]
    h = 0.5 * float(np.linalg.norm((hi - lo) / np.asarray(res, np.float64)))
    pv = tuple(jnp.asarray(verts[indices[:, k]]) for k in range(dim))

    def one_chunk(args):
        c, hh = args
        d, _ = prim_closest_point(dim, c[:, None, :], tuple(v[None] for v in pv))
        m = jnp.min(d, axis=-1)
        return jnp.max(jnp.sum(d <= (m + 2.0 * hh)[:, None], axis=-1))

    SC = 32
    super_cells = SC * chunk
    C_pad = -(-C // super_cells) * super_cells
    centers_pad = np.zeros((C_pad, dim), np.float32)
    centers_pad[:C] = centers

    @jax.jit
    def count_super(cs, hh):
        hs = jnp.broadcast_to(hh, (SC,))
        return jnp.max(jax.lax.map(one_chunk, (cs.reshape(SC, chunk, dim), hs)))

    max_count = 0
    for s in range(0, C_pad, super_cells):
        max_count = max(max_count, int(count_super(
            jnp.asarray(centers_pad[s:s + super_cells]), jnp.float32(h))))
    return max_count


def build_candidate_grid(
    verts: np.ndarray,
    indices: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    K: int = 32,
    max_res: int = 2048,
    cache_dir: str | None = None,
) -> CandidateGrid:
    dim = indices.shape[1]
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    span = hi - lo

    key = hashlib.sha1(
        verts.tobytes() + indices.tobytes() + lo.tobytes() + hi.tobytes()
        + np.int64([K, max_res]).tobytes()
    ).hexdigest()[:16]
    cache_path = os.path.join(cache_dir, f"candgrid_{key}.npz") if cache_dir else None
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        return CandidateGrid(
            origin=jnp.asarray(z["origin"]), inv_cell=jnp.asarray(z["inv_cell"]),
            res=tuple(int(r) for r in z["res"]), cand=jnp.asarray(z["cand"]),
            coverage=jnp.asarray(z["coverage"]),
        )

    # Strategy: probe the band count at two coarse resolutions to fit its
    # scaling exponent (dense hatch fills and fan vertices make it sub- or
    # super-linear in cell size), then pick the finest (resolution, K) that
    # keeps coverage exact under the memory budget.
    BUDGET = 1.4e9  # total candidate slots (int32)
    K_CAP = 2048

    def res_tuple(scalar):
        return tuple(min(max(int(scalar * span[d] / max(span)), 8), max_res)
                     for d in range(dim))

    probe_scalar = 256 if dim == 2 else 64
    probe_res = res_tuple(probe_scalar)
    probe_count = _count_at_res(verts, indices, lo, hi, probe_res)
    res, max_count, cand = probe_res, probe_count, None

    if probe_count <= K:
        cand, max_count = _build_at_res(verts, indices, lo, hi, probe_res, K)
    else:
        probe_count2 = _count_at_res(verts, indices, lo, hi,
                                     res_tuple(probe_scalar * 2))
        # count(res) ~ probe_count * (probe_scalar / res)^p
        p = np.log2(max(probe_count, 1) / max(probe_count2, 1))
        p = float(np.clip(p, 0.0, 2.0))

        chosen = (probe_scalar,
                  int(min(K_CAP, 2 ** np.ceil(np.log2(max(probe_count, K))))))
        scalar = probe_scalar
        while scalar * 2 <= max_res:
            scalar *= 2
            k_est = probe_count * (probe_scalar / scalar) ** p * 1.3
            k_need = int(2 ** np.ceil(np.log2(max(k_est, K))))
            cells = int(np.prod(res_tuple(scalar)))
            if k_need <= K_CAP and cells * k_need <= BUDGET:
                chosen = (scalar, k_need)   # finest feasible wins
        scalar, K = chosen
        # build, doubling K (then coarsening) until the measured band fits
        while True:
            res = res_tuple(scalar)
            cand, max_count = _build_at_res(verts, indices, lo, hi, res, K)
            if max_count <= K:
                break
            if K * 2 <= K_CAP and int(np.prod(res)) * K * 2 <= BUDGET:
                K *= 2
            elif scalar > probe_scalar:
                scalar //= 2
            else:
                break  # give up exactness; coverage flag records it

    inv_cell = np.asarray(res, np.float32) / np.maximum(span, 1e-20)
    coverage = 1.0 if max_count <= K else 0.0
    grid = CandidateGrid(
        origin=jnp.asarray(lo),
        inv_cell=jnp.asarray(inv_cell),
        res=res,
        cand=jnp.asarray(cand),
        coverage=jnp.asarray(np.float32(coverage)),
    )
    if max_count > K:
        import logging
        logging.getLogger("elaina").warning(
            "candidate grid: band needs %d prims > K=%d at res %s; "
            "nearest results may be approximate in dense regions", max_count, K, res)
    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez_compressed(
            cache_path, origin=np.asarray(lo), inv_cell=inv_cell,
            res=np.asarray(res, np.int64), cand=cand,
            coverage=np.float32(coverage),
        )
    return grid


def grid_cell_index(grid: CandidateGrid, q):
    """Linear cell index for query points (clamped to the grid)."""
    rel = (q - grid.origin) * grid.inv_cell
    dim = len(grid.res)
    idx = jnp.clip(rel.astype(jnp.int32), 0,
                   jnp.asarray([r - 1 for r in grid.res], jnp.int32))
    lin = idx[..., 0]
    for d in range(1, dim):
        lin = lin * grid.res[d] + idx[..., d]
    return lin


def _use_pallas() -> bool:
    import jax as _jax
    return (os.environ.get("ELAINA_PALLAS", "0") == "1"
            and _jax.default_backend() == "tpu")


def grid_closest_point(grid: CandidateGrid, verts, indices, q):
    """Exact closest point via the candidate grid.

    q: (N, D) -> (dist (N,), prim_id (N,)).  Exact for in-grid queries
    whenever the build fit the band (grid.coverage == 1); out-of-grid
    queries use the clamped border cell's candidates.

    Set ELAINA_PALLAS=1 to run the band sweep through the fused Pallas
    kernel (ops/pallas_queries.candidate_band_pallas) on TPU.
    """
    dim = indices.shape[1]
    K = grid.cand.shape[1]
    lin = grid_cell_index(grid, q)

    def band_slice(k0, kc):
        cand = jax.lax.dynamic_slice_in_dim(grid.cand, k0, kc, 1)[lin]
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
        cand = jax.lax.dynamic_slice_in_dim(grid.cand, i * KC, KC, 1)[lin]
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
