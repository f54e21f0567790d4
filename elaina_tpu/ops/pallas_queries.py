"""Pallas TPU kernels for the dense geometry sweeps.

The wavefront's hot geometric work on TPU is lanes x primitives vector
math.  XLA already fuses these sweeps well; the Pallas versions here go
further for the cases that matter:

* the primitive soup is pinned in VMEM once per kernel (the shipped scenes'
  Neumann sets and candidate-grid bands are a few KB),
* one grid pass computes the distance *and* the argmin without
  materializing the (lanes, prims) matrix in HBM,
* block shapes are aligned to the VPU (8x128 lanes per tile).

Kernels fall back to the jnp implementations (geometry/queries.py) off-TPU;
``interpret=True`` paths keep them testable on CPU.

Reference counterparts: the per-thread distance loops of the snch-lbvh
queries (SURVEY.md §2.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 1024  # lanes per grid step (8 sublanes x 128 lanes)

# grid band DMA sweep parameters
DMA_BLOCK = 256       # lanes per kernel block (row DMAs in flight)
DMA_LANE_CHUNK = 8192   # lanes per pallas_call (bounds SMEM scalar prefetch)


def _make_grid_band_dma_kernel(rpp: int):
    """Build the kernel for rpp = K/128 sublane rows per coordinate plane."""

    def kernel(lin_ref, q_ref, tab_ref, d2_ref, slot_ref, ax_ref, ay_ref,
               bx_ref, by_ref, buf, sems):
        """Per-lane candidate-block DMA + dense segment-distance sweep.

        Each lane DMAs its grid cell's coordinate block ((n_rows, 128) f32:
        4 planes of K candidate segment endpoints, plane p at sublane rows
        [p*rpp, (p+1)*rpp)) from HBM into VMEM, then the block computes all
        lane x candidate distances on the VPU with zero gathers.  This
        replaces the XLA gather formulation whose per-element cost
        (~18 cycles) dominated the whole solve.

        Lanes with a negative row index SKIP their DMA (start and wait):
        the scattered-row fetch rate is the hardware floor, so per-lane
        predication (dead walks, lanes far from the boundary) is the main
        throughput lever.  Their outputs are garbage; callers mask.
        """
        b = pl.program_id(0)
        BL = q_ref.shape[0]

        def issue(l, carry):
            cell = lin_ref[b * BL + l]

            @pl.when(cell >= 0)
            def _():
                pltpu.make_async_copy(tab_ref.at[cell], buf.at[l],
                                      sems).start()
            return carry

        jax.lax.fori_loop(0, BL, issue, 0, unroll=BL)

        def wait(l, carry):
            cell = lin_ref[b * BL + l]

            @pl.when(cell >= 0)
            def _():
                pltpu.make_async_copy(tab_ref.at[cell], buf.at[l],
                                      sems).wait()
            return carry

        # full unroll: the rolled scalar loop costs ~10ns/lane more
        # (measured, tools/tpu_kernel_variants.py)
        jax.lax.fori_loop(0, BL, wait, 0, unroll=BL)

        qx = q_ref[:, 0:1]                            # (BL, 1)
        qy = q_ref[:, 1:2]
        K = rpp * 128
        best_d2 = jnp.full((BL, 128), jnp.float32(jnp.inf))
        best_flat = jnp.full((BL, 128), K, jnp.int32)
        best_ax = jnp.zeros((BL, 128), jnp.float32)
        best_ay = jnp.zeros((BL, 128), jnp.float32)
        best_bx = jnp.zeros((BL, 128), jnp.float32)
        best_by = jnp.zeros((BL, 128), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BL, 128), 1)
        for r in range(rpp):                          # rank-2 compute only
            ax = buf[:, 0 * rpp + r, :]               # (BL, 128)
            ay = buf[:, 1 * rpp + r, :]
            bx = buf[:, 2 * rpp + r, :]
            by = buf[:, 3 * rpp + r, :]
            ex = bx - ax
            ey = by - ay
            wx = qx - ax
            wy = qy - ay
            den = jnp.maximum(ex * ex + ey * ey, 1e-30)
            t = jnp.clip((wx * ex + wy * ey) / den, 0.0, 1.0)
            dx = wx - t * ex
            dy = wy - t * ey
            d2 = dx * dx + dy * dy                    # (BL, 128)
            better = d2 < best_d2                     # strict: first r wins
            best_d2 = jnp.where(better, d2, best_d2)
            best_flat = jnp.where(better, r * 128 + lane, best_flat)
            best_ax = jnp.where(better, ax, best_ax)
            best_ay = jnp.where(better, ay, best_ay)
            best_bx = jnp.where(better, bx, best_bx)
            best_by = jnp.where(better, by, best_by)
        best = jnp.min(best_d2, axis=1)               # (BL,)
        slot = jnp.min(jnp.where(best_d2 <= best[:, None], best_flat, K),
                       axis=1)
        # winning column (consistent with slot's tie-break: within a column
        # the strict `better` keeps the smallest r, and slot's global min
        # flat lands on that same candidate)
        wcol = slot - (slot // 128) * 128             # (BL,)
        sel = lane == wcol[:, None]
        d2_ref[pl.ds(b, 1), :] = best[None, :]
        slot_ref[pl.ds(b, 1), :] = jnp.minimum(slot, K - 1)[None, :]
        ax_ref[pl.ds(b, 1), :] = jnp.sum(
            jnp.where(sel, best_ax, 0.0), axis=1)[None, :]
        ay_ref[pl.ds(b, 1), :] = jnp.sum(
            jnp.where(sel, best_ay, 0.0), axis=1)[None, :]
        bx_ref[pl.ds(b, 1), :] = jnp.sum(
            jnp.where(sel, best_bx, 0.0), axis=1)[None, :]
        by_ref[pl.ds(b, 1), :] = jnp.sum(
            jnp.where(sel, best_by, 0.0), axis=1)[None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("rpp", "interpret"))
def grid_band_dma_2d(lin, q, coords, rpp: int, *, interpret: bool = False):
    """Candidate-grid closest-point sweep via per-lane block DMA.

    lin: (N,) int32 candidate-table row per lane; q: (N, 2) f32;
    coords: (R, n_rows, 128) f32 coordinate table
    (geometry/grid.coords_from_cand layout); rpp = ceil(K/128) sublane rows
    per plane.  Returns (d2 (N,), slot (N,) int32 in [0, rpp*128),
    (ax, ay, bx, by) (N,) each) — the winning candidate's endpoint
    coordinates, so callers compute uv/side/normals without any per-lane
    vertex gathers.
    """
    n = lin.shape[0]
    n_rows = coords.shape[1]
    if n_rows < 4 * rpp:
        raise ValueError(f"coords table {coords.shape} too small for rpp={rpp}")
    BL = DMA_BLOCK
    LC = min(DMA_LANE_CHUNK, -(-n // BL) * BL)
    n_pad = -(-n // LC) * LC

    lin_p = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(lin)
    q_p = jnp.zeros((n_pad, 2), jnp.float32).at[:n].set(q)

    call = pl.pallas_call(
        _make_grid_band_dma_kernel(rpp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(LC // BL,),
            in_specs=[
                pl.BlockSpec((BL, 2), lambda i, lin_ref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=tuple(
                pl.BlockSpec((LC // BL, BL), lambda i, lin_ref: (0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(6)),
            scratch_shapes=[
                pltpu.VMEM((BL, n_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.int32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * LC * rpp * 128,
            bytes_accessed=LC * n_rows * 128 * 4 + LC * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    if n_pad == LC:
        outs = call(lin_p, q_p, coords)
    else:
        lin_r = lin_p.reshape(-1, LC)
        q_r = q_p.reshape(-1, LC, 2)

        def body(carry, xs):
            l_c, q_c = xs
            return carry, call(l_c, q_c, coords)

        _, outs = jax.lax.scan(body, 0, (lin_r, q_r))
    d2, slot, ax, ay, bx, by = (o.reshape(-1)[:n] for o in outs)
    return d2, slot, (ax, ay, bx, by)


def _tri_d2_tile(qx, qy, qz, c):
    """Point-triangle squared distance on (BL, 128) coordinate tiles.

    c = (ax, ay, az, bx, by, bz, cx, cy, cz).  Same formulation as
    geometry/grid._tri_planar_d2: interior via the explicit residual (no
    cancellation), else min over the three edge distances.
    """
    a = c[0:3]
    b = c[3:6]
    cc = c[6:9]
    q3 = (qx, qy, qz)

    def sub(u, v):
        return tuple(ui - vi for ui, vi in zip(u, v))

    def dot3(u, v):
        return sum(ui * vi for ui, vi in zip(u, v))

    e1 = sub(b, a)
    e2 = sub(cc, a)
    w = sub(q3, a)
    d11 = dot3(e1, e1)
    d12 = dot3(e1, e2)
    d22 = dot3(e2, e2)
    w1 = dot3(w, e1)
    w2 = dot3(w, e2)
    den = jnp.maximum(d11 * d22 - d12 * d12, 1e-30)
    u = (d22 * w1 - d12 * w2) / den
    v = (d11 * w2 - d12 * w1) / den
    inside = (u >= 0) & (v >= 0) & (u + v <= 1)
    diff = tuple(wi - u * e1i - v * e2i for wi, e1i, e2i in zip(w, e1, e2))
    d2_in = dot3(diff, diff)

    def edge_d2(p0, p1):
        e = sub(p1, p0)
        wp = sub(q3, p0)
        t = jnp.clip(dot3(wp, e) / jnp.maximum(dot3(e, e), 1e-30), 0.0, 1.0)
        dd = tuple(wi - t * ei for wi, ei in zip(wp, e))
        return dot3(dd, dd)

    d2_edge = jnp.minimum(jnp.minimum(edge_d2(a, b), edge_d2(b, cc)),
                          edge_d2(cc, a))
    return jnp.where(inside, d2_in, d2_edge)


def _make_grid_band_dma_kernel_3d(rpp: int):
    """3D variant: 9 coordinate planes (triangle corners), point-triangle
    distance; otherwise identical DMA/predication structure to the 2D
    kernel above."""

    def kernel(lin_ref, q_ref, tab_ref, d2_ref, slot_ref, *rest):
        coord_refs = rest[:9]
        buf, sems = rest[9], rest[10]
        b = pl.program_id(0)
        BL = q_ref.shape[0]

        def issue(l, carry):
            cell = lin_ref[b * BL + l]

            @pl.when(cell >= 0)
            def _():
                pltpu.make_async_copy(tab_ref.at[cell], buf.at[l],
                                      sems).start()
            return carry

        jax.lax.fori_loop(0, BL, issue, 0, unroll=BL)

        def wait(l, carry):
            cell = lin_ref[b * BL + l]

            @pl.when(cell >= 0)
            def _():
                pltpu.make_async_copy(tab_ref.at[cell], buf.at[l],
                                      sems).wait()
            return carry

        jax.lax.fori_loop(0, BL, wait, 0, unroll=BL)

        qx = q_ref[:, 0:1]
        qy = q_ref[:, 1:2]
        qz = q_ref[:, 2:3]
        K = rpp * 128
        best_d2 = jnp.full((BL, 128), jnp.float32(jnp.inf))
        best_flat = jnp.full((BL, 128), K, jnp.int32)
        best_c = [jnp.zeros((BL, 128), jnp.float32) for _ in range(9)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (BL, 128), 1)
        for r in range(rpp):
            c = tuple(buf[:, p * rpp + r, :] for p in range(9))
            d2 = _tri_d2_tile(qx, qy, qz, c)
            better = d2 < best_d2
            best_d2 = jnp.where(better, d2, best_d2)
            best_flat = jnp.where(better, r * 128 + lane, best_flat)
            best_c = [jnp.where(better, c[p], best_c[p]) for p in range(9)]
        best = jnp.min(best_d2, axis=1)
        slot = jnp.min(jnp.where(best_d2 <= best[:, None], best_flat, K),
                       axis=1)
        wcol = slot - (slot // 128) * 128
        sel = lane == wcol[:, None]
        d2_ref[pl.ds(b, 1), :] = best[None, :]
        slot_ref[pl.ds(b, 1), :] = jnp.minimum(slot, K - 1)[None, :]
        for p in range(9):
            coord_refs[p][pl.ds(b, 1), :] = jnp.sum(
                jnp.where(sel, best_c[p], 0.0), axis=1)[None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("rpp", "interpret"))
def grid_band_dma_3d(lin, q, coords, rpp: int, *, interpret: bool = False):
    """3D candidate-grid closest-point sweep via per-lane block DMA.

    lin: (N,) int32 candidate-table row per lane (< 0 skips the DMA);
    q: (N, 3) f32; coords: (R, n_rows, 128) f32 with 9 planes (corner k,
    axis d at plane k*3+d; coords_from_cand layout).  Returns
    (d2 (N,), slot (N,) int32, 9-tuple of winner corner coordinates
    (ax, ay, az, bx, by, bz, cx, cy, cz) each (N,)).
    """
    n = lin.shape[0]
    n_rows = coords.shape[1]
    if n_rows < 9 * rpp:
        raise ValueError(f"coords table {coords.shape} too small for rpp={rpp}")
    # Smaller block than the 2D kernel: the 3D sweep holds 11 winner
    # accumulators plus ~20 (BL, 128) triangle-distance temps live next
    # to the (BL, n_rows, 128) DMA scratch — at BL=256 and K=256 the
    # scoped-VMEM stack hit 28.7 MB against the 16 MB limit (neumann3d
    # compile OOM, round 4).  BL=64 keeps it a few MB with margin for
    # K=512 (n_rows=40).  This kernel is the CHAIN-path fallback (the
    # bitmask fast path covers production), so block-width throughput is
    # secondary to compiling everywhere.
    BL = 64
    LC = min(DMA_LANE_CHUNK, -(-n // BL) * BL)
    n_pad = -(-n // LC) * LC

    lin_p = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(lin)
    q_p = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(q)

    n_out = 11
    call = pl.pallas_call(
        _make_grid_band_dma_kernel_3d(rpp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(LC // BL,),
            in_specs=[
                pl.BlockSpec((BL, 3), lambda i, lin_ref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=tuple(
                pl.BlockSpec((LC // BL, BL), lambda i, lin_ref: (0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_out)),
            scratch_shapes=[
                pltpu.VMEM((BL, n_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.int32),
        ) + tuple(jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32)
                  for _ in range(9)),
        cost_estimate=pl.CostEstimate(
            flops=60 * LC * rpp * 128,
            bytes_accessed=LC * n_rows * 128 * 4 + LC * 24,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    if n_pad == LC:
        outs = call(lin_p, q_p, coords)
    else:
        lin_r = lin_p.reshape(-1, LC)
        q_r = q_p.reshape(-1, LC, 3)

        def body(carry, xs):
            l_c, q_c = xs
            return carry, call(l_c, q_c, coords)

        _, outs = jax.lax.scan(body, 0, (lin_r, q_r))
    flat = tuple(o.reshape(-1)[:n] for o in outs)
    return flat[0], flat[1], flat[2:]


def _seg_closest_tile(q_ref, ax_ref, ay_ref, bx_ref, by_ref, dist_ref,
                      idx_ref):
    """One lane tile vs all segments: fused distance + argmin.

    q: (T, 2); segment endpoints as (1, P) rows; outputs (T,), (T,) i32.
    """
    qx = q_ref[:, 0:1]                       # (T, 1)
    qy = q_ref[:, 1:2]
    ax, ay = ax_ref[:], ay_ref[:]            # (1, P)
    bx, by = bx_ref[:], by_ref[:]
    ex = bx - ax
    ey = by - ay
    wx = qx - ax                             # (T, P)
    wy = qy - ay
    den = jnp.maximum(ex * ex + ey * ey, 1e-30)
    t = jnp.clip((wx * ex + wy * ey) / den, 0.0, 1.0)
    dx = wx - t * ex
    dy = wy - t * ey
    d2 = dx * dx + dy * dy                   # (T, P)
    best = jnp.min(d2, axis=1)
    # argmin without gather: smallest index attaining the min
    P = d2.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    idx = jnp.min(jnp.where(d2 <= best[:, None], cols, P), axis=1)
    dist_ref[:] = jnp.sqrt(best)
    idx_ref[:] = idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_point_dense_pallas(q, seg_a, seg_b, *, interpret: bool = False):
    """2D dense closest-point sweep: q (N, 2) vs segments (P, 2)+(P, 2).

    Returns (dist (N,), prim (N,) int32).  P is padded to 128 lanes; N to
    the lane tile.
    """
    n = q.shape[0]
    P = seg_a.shape[0]
    P_pad = -(-P // 128) * 128
    n_pad = -(-n // LANE_TILE) * LANE_TILE

    big = jnp.float32(3.0e18)  # padded segments live far away
    ax = jnp.full((1, P_pad), big).at[0, :P].set(seg_a[:, 0])
    ay = jnp.full((1, P_pad), big).at[0, :P].set(seg_a[:, 1])
    bx = jnp.full((1, P_pad), big).at[0, :P].set(seg_b[:, 0])
    by = jnp.full((1, P_pad), big).at[0, :P].set(seg_b[:, 1])
    qp = jnp.zeros((n_pad, 2), jnp.float32).at[:n].set(q)

    grid = (n_pad // LANE_TILE,)
    dist, idx = pl.pallas_call(
        _seg_closest_tile,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANE_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((LANE_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * n_pad * P_pad,
            bytes_accessed=n_pad * 2 * 4 + 4 * P_pad * 4 + n_pad * 8,
            transcendentals=n_pad,
        ),
        interpret=interpret,
    )(qp, ax, ay, bx, by)
    return dist[:n], jnp.minimum(idx[:n], P - 1)


def _cand_band_tile(q_ref, vax_ref, vay_ref, vbx_ref, vby_ref, valid_ref,
                    dist_ref, slot_ref):
    """Candidate-band tile: per lane its own K gathered segments.

    q: (T, 2); endpoints (T, K); valid (T, K) (1/0); outputs best distance
    and the best *slot* in [0, K) (caller maps slots back to prim ids).
    """
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    ax, ay = vax_ref[:], vay_ref[:]
    bx, by = vbx_ref[:], vby_ref[:]
    ex = bx - ax
    ey = by - ay
    wx = qx - ax
    wy = qy - ay
    den = jnp.maximum(ex * ex + ey * ey, 1e-30)
    t = jnp.clip((wx * ex + wy * ey) / den, 0.0, 1.0)
    dx = wx - t * ex
    dy = wy - t * ey
    d2 = dx * dx + dy * dy
    d2 = jnp.where(valid_ref[:] > 0, d2, jnp.float32(jnp.inf))
    best = jnp.min(d2, axis=1)
    K = d2.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    slot = jnp.min(jnp.where(d2 <= best[:, None], cols, K), axis=1)
    dist_ref[:] = jnp.sqrt(best)
    slot_ref[:] = jnp.minimum(slot, K - 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def candidate_band_pallas(q, vax, vay, vbx, vby, valid, *,
                          interpret: bool = False):
    """Closest point over per-lane candidate bands (grid accel inner loop).

    q (N, 2); vax..vby (N, K) gathered endpoint coordinates; valid (N, K).
    Returns (dist (N,), slot (N,) int32 in [0, K)).
    """
    n, K = vax.shape
    K_pad = -(-K // 128) * 128
    n_pad = -(-n // LANE_TILE) * LANE_TILE

    def pad(a, fill):
        out = jnp.full((n_pad, K_pad), fill, a.dtype)
        return out.at[:n, :K].set(a)

    qp = jnp.zeros((n_pad, 2), jnp.float32).at[:n].set(q)
    args = (pad(vax, 1e18), pad(vay, 1e18), pad(vbx, 1e18), pad(vby, 1e18),
            pad(valid.astype(jnp.int32), 0))

    grid = (n_pad // LANE_TILE,)
    dist, slot = pl.pallas_call(
        _cand_band_tile,
        grid=grid,
        in_specs=[pl.BlockSpec((LANE_TILE, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((LANE_TILE, K_pad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec((LANE_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * n_pad * K_pad,
            bytes_accessed=n_pad * (2 + 5 * K_pad) * 4,
            transcendentals=n_pad,
        ),
        interpret=interpret,
    )(qp, *args)
    return dist[:n], slot[:n]


# --------------------------------------------------------------------------- #
# silhouette band DMA sweep
# --------------------------------------------------------------------------- #
#
# The SilGrid query's gather formulation (geometry/queries.py
# grid_closest_silhouette: rows (N, K) + five (N, K, D) entity gathers)
# measured 109 ms / 65k lanes on TPU (1668 ns/lane, tools/tpu_sil_probe.py)
# — XLA random-access gathers are the floor, exactly like the Dirichlet
# candidate sweep before grid_band_dma_*.  This kernel applies the same
# cure: the per-cell K-entity band is pre-packed into a planar coordinate
# table (grid.sil_coords_from_rows) and each lane DMAs its cell's block
# once, so the silhouette test (segment/vertex distance + the two-normal
# sign test, snch-lbvh's silhouette predicate) runs on (BL, 128) VPU
# tiles with zero gathers.  ``always``-silhouette entities are encoded
# with n1 = 0 (s1*s2 = 0 <= 0 keeps them unconditionally); padded slots
# carry far-away coordinates and zero normals, so they pass the sign
# test with a huge distance and never win the min.


def _make_sil_band_dma_kernel(rpp: int, dim: int):
    ng = 4 if dim == 3 else 3      # plane groups: p0[,p1],n1,n2

    def kernel(lin_ref, q_ref, tab_ref, d2_ref, buf, sems):
        b = pl.program_id(0)
        BL = q_ref.shape[0]

        def issue(l, carry):
            cell = lin_ref[b * BL + l]

            @pl.when(cell >= 0)
            def _():
                pltpu.make_async_copy(tab_ref.at[cell], buf.at[l],
                                      sems).start()
            return carry

        jax.lax.fori_loop(0, BL, issue, 0, unroll=BL)

        def wait(l, carry):
            cell = lin_ref[b * BL + l]

            @pl.when(cell >= 0)
            def _():
                pltpu.make_async_copy(tab_ref.at[cell], buf.at[l],
                                      sems).wait()
            return carry

        jax.lax.fori_loop(0, BL, wait, 0, unroll=BL)

        qd = tuple(q_ref[:, d:d + 1] for d in range(dim))
        best = jnp.full((BL, 128), jnp.float32(jnp.inf))
        for r in range(rpp):
            c = tuple(buf[:, p * rpp + r, :] for p in range(ng * dim))
            p0 = c[0:dim]
            if dim == 3:
                p1 = c[dim:2 * dim]
                n1 = c[2 * dim:3 * dim]
                n2 = c[3 * dim:4 * dim]
                e = tuple(p1[d] - p0[d] for d in range(3))
                w = tuple(qd[d] - p0[d] for d in range(3))
                den = jnp.maximum(sum(ed * ed for ed in e), 1e-30)
                t = jnp.clip(sum(wd * ed for wd, ed in zip(w, e)) / den,
                             0.0, 1.0)
                v = tuple(wd - t * ed for wd, ed in zip(w, e))
            else:
                n1 = c[dim:2 * dim]
                n2 = c[2 * dim:3 * dim]
                v = tuple(qd[d] - p0[d] for d in range(2))
            d2 = sum(vd * vd for vd in v)
            s1 = sum(nd * vd for nd, vd in zip(n1, v))
            s2 = sum(nd * vd for nd, vd in zip(n2, v))
            best = jnp.minimum(
                best, jnp.where(s1 * s2 <= 0.0, d2, jnp.float32(jnp.inf)))
        d2_ref[pl.ds(b, 1), :] = jnp.min(best, axis=1)[None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("rpp", "dim", "interpret"))
def sil_band_dma(lin, q, coords, rpp: int, dim: int, *,
                 interpret: bool = False):
    """Silhouette-grid nearest-silhouette sweep via per-lane block DMA.

    lin: (N,) int32 SilGrid cell per lane (< 0 skips the DMA — callers
    mask those outputs); q: (N, dim) f32; coords: (C, n_rows, 128) f32
    (grid.sil_coords_from_rows layout).  Returns d2 (N,) — squared
    distance to the nearest kept silhouette entity (inf when the cell's
    band holds none passing the sign test); callers clamp with the
    cell's r_cap.
    """
    n = lin.shape[0]
    n_rows = coords.shape[1]
    nplanes = (4 if dim == 3 else 3) * dim
    if n_rows < nplanes * rpp:
        raise ValueError(f"sil coords table {coords.shape} too small "
                         f"for rpp={rpp}")
    BL = DMA_BLOCK
    LC = min(DMA_LANE_CHUNK, -(-n // BL) * BL)
    n_pad = -(-n // LC) * LC

    lin_p = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(lin)
    q_p = jnp.zeros((n_pad, dim), jnp.float32).at[:n].set(q)

    call = pl.pallas_call(
        _make_sil_band_dma_kernel(rpp, dim),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(LC // BL,),
            in_specs=[
                pl.BlockSpec((BL, dim), lambda i, lin_ref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((LC // BL, BL), lambda i, lin_ref: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((BL, n_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),),
        cost_estimate=pl.CostEstimate(
            flops=30 * LC * rpp * 128,
            bytes_accessed=LC * n_rows * 128 * 4 + LC * 4 * dim,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    if n_pad == LC:
        outs = call(lin_p, q_p, coords)
    else:
        lin_r = lin_p.reshape(-1, LC)
        q_r = q_p.reshape(-1, LC, dim)

        def body(carry, xs):
            l_c, q_c = xs
            return carry, call(l_c, q_c, coords)

        _, outs = jax.lax.scan(body, 0, (lin_r, q_r))
    return outs[0].reshape(-1)[:n]


# --------------------------------------------------------------------------- #
# Neumann prim-band DMA sweeps (3D)
# --------------------------------------------------------------------------- #
#
# The PrimBandGrid queries (geometry/queries.band_ray_intersect /
# band_sample_in_ball) replaced the per-lane stack-BVH descent with ONE
# row gather + dense K-wide sweeps, but the gather formulation still
# fetches K x 9 corner floats per lane per query through XLA's
# random-access gather (the measured ~1.7 us/lane floor that motivated
# sil_band_dma).  These kernels apply the same cure: the band's corner
# coordinates are pre-packed per cell (grid.coords_from_cand layout, 9
# planes in 3D) and each lane DMAs its cell's block once, so the
# Moller-Trumbore ray sweep and the Green-weighted in-ball CDF sampling
# run on (BL, 128) VPU tiles with zero gathers.  Only the WINNING slot's
# prim id / vertices are gathered afterwards (one element per lane).
# Reference counterparts: lbvh ray_intersect / sample_object_in_sphere
# (uniform/integrator.cu:287-291, 349-365).

BAND_DMA_BLOCK = 64   # 3D kernels hold ~25 (BL, 128) temps next to the
#                       (BL, n_rows, 128) DMA scratch; 64 keeps scoped
#                       VMEM a few MB (the BL=256 variant OOM'd at 16 MB)


def _band_dma_loops(lin_ref, tab_ref, buf, sems, b, BL):
    """Issue + wait the per-lane cell-block DMAs (shared skeleton)."""
    def issue(l, carry):
        cell = lin_ref[b * BL + l]

        @pl.when(cell >= 0)
        def _():
            pltpu.make_async_copy(tab_ref.at[cell], buf.at[l], sems).start()
        return carry

    jax.lax.fori_loop(0, BL, issue, 0, unroll=BL)

    def wait(l, carry):
        cell = lin_ref[b * BL + l]

        @pl.when(cell >= 0)
        def _():
            pltpu.make_async_copy(tab_ref.at[cell], buf.at[l], sems).wait()
        return carry

    jax.lax.fori_loop(0, BL, wait, 0, unroll=BL)


def _make_band_ray_kernel_3d(rpp: int):
    """Ray vs per-lane triangle band: Moller-Trumbore tiles, min-t winner.

    Mirrors geometry/primitives.ray_tri_intersect exactly (det guard
    1e-12, t in (1e-6, tmax]); padded slots carry identical PAD_COORD
    corners -> det = 0 -> miss.
    """

    def kernel(lin_ref, od_ref, tab_ref, t_ref, slot_ref, buf, sems):
        b = pl.program_id(0)
        BL = od_ref.shape[0]
        _band_dma_loops(lin_ref, tab_ref, buf, sems, b, BL)

        o = tuple(od_ref[:, d:d + 1] for d in range(3))      # (BL, 1)
        d = tuple(od_ref[:, 3 + d_:4 + d_] for d_ in range(3))
        tmax = od_ref[:, 6:7]
        K = rpp * 128
        best_t = jnp.full((BL, 128), jnp.float32(jnp.inf))
        best_flat = jnp.full((BL, 128), K, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BL, 128), 1)
        for r in range(rpp):
            c = tuple(buf[:, p * rpp + r, :] for p in range(9))
            a = c[0:3]
            e1 = tuple(c[3 + k] - c[k] for k in range(3))
            e2 = tuple(c[6 + k] - c[k] for k in range(3))

            def cross(u, v):
                return (u[1] * v[2] - u[2] * v[1],
                        u[2] * v[0] - u[0] * v[2],
                        u[0] * v[1] - u[1] * v[0])

            def dot(u, v):
                return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

            p = cross(d, e2)
            det = dot(e1, p)
            safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
            tv = tuple(o[k] - a[k] for k in range(3))
            u = dot(tv, p) / safe
            qv = cross(tv, e1)
            v = dot(d, qv) / safe
            t = dot(e2, qv) / safe
            hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                   & (u + v <= 1.0) & (t > 1e-6) & (t <= tmax))
            tt = jnp.where(hit, t, jnp.float32(jnp.inf))
            better = tt < best_t
            best_t = jnp.where(better, tt, best_t)
            best_flat = jnp.where(better, r * 128 + lane, best_flat)
        best = jnp.min(best_t, axis=1)
        slot = jnp.min(jnp.where(best_t <= best[:, None], best_flat, K),
                       axis=1)
        t_ref[pl.ds(b, 1), :] = best[None, :]
        slot_ref[pl.ds(b, 1), :] = jnp.minimum(slot, K - 1)[None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("rpp", "interpret"))
def band_ray_dma_3d(lin, o, d, tmax, coords, rpp: int, *,
                    interpret: bool = False):
    """Prim-band ray sweep via per-lane block DMA.

    lin: (N,) int32 band-grid cell per lane (< 0 skips the DMA — callers
    mask); o, d: (N, 3) f32; tmax: (N,) f32; coords: (C, n_rows, 128)
    f32 (grid.coords_from_cand layout, 9 corner planes).  Returns
    (t (N,) — inf on miss, slot (N,) int32 in [0, rpp*128)).
    """
    n = lin.shape[0]
    n_rows = coords.shape[1]
    if n_rows < 9 * rpp:
        raise ValueError(f"coords table {coords.shape} too small for "
                         f"rpp={rpp}")
    BL = BAND_DMA_BLOCK
    LC = min(DMA_LANE_CHUNK, -(-n // BL) * BL)
    n_pad = -(-n // LC) * LC

    lin_p = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(lin)
    od = jnp.zeros((n_pad, 7), jnp.float32)
    od = od.at[:n, 0:3].set(o).at[:n, 3:6].set(d).at[:n, 6].set(tmax)

    call = pl.pallas_call(
        _make_band_ray_kernel_3d(rpp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(LC // BL,),
            in_specs=[
                pl.BlockSpec((BL, 7), lambda i, lin_ref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((LC // BL, BL), lambda i, lin_ref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LC // BL, BL), lambda i, lin_ref: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((BL, n_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=45 * LC * rpp * 128,
            bytes_accessed=LC * n_rows * 128 * 4 + LC * 28,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    if n_pad == LC:
        outs = call(lin_p, od, coords)
    else:
        lin_r = lin_p.reshape(-1, LC)
        od_r = od.reshape(-1, LC, 7)

        def body(carry, xs):
            l_c, od_c = xs
            return carry, call(l_c, od_c, coords)

        _, outs = jax.lax.scan(body, 0, (lin_r, od_r))
    t, slot = (x.reshape(-1)[:n] for x in outs)
    return t, slot


def _make_band_neumann_walk_kernel_3d(rpp: int):
    """FUSED per-step Neumann workload: one cell-block DMA serves the
    Green-weighted in-ball CDF sample, the sample-point visibility ray,
    AND the walk ray (the three queries of one WoSt step on a Neumann
    scene, uniform/integrator.cu:318-445 + 447-526).

    The unfused path issues three kernels that each re-DMA the SAME
    per-lane block and then gathers the winners' vertices/normals back in
    XLA (~2 ms per gather at 65k lanes); here the winning triangle's
    corners are extracted in-tile, so the sample point, its plane side,
    the plane normal (for side_on), and the walk hit's shading normal all
    leave the kernel as dense per-lane scalars — zero gathers downstream
    except the winner's prim id -> color row.

    Per-lane input row (BL, 16) f32:
      [qx, qy, qz, R, on_neumann, nnx, nny, nnz, u_sel, u1, u2,
       dwx, dwy, dwz, eps, pad]
    f32 output rows (15, BL):
      [w_sel, total, spx, spy, spz, side, nwx, nwy, nwz,
       occluded, walk_hit, walk_t, wnx, wny, wnz]
    int32 output rows (1, BL): [ball slot]
    """

    def kernel(lin_ref, dat_ref, tab_ref, out_ref, slot_ref, buf, sems):
        b = pl.program_id(0)
        BL = dat_ref.shape[0]
        _band_dma_loops(lin_ref, tab_ref, buf, sems, b, BL)

        q3 = tuple(dat_ref[:, k:k + 1] for k in range(3))
        R = dat_ref[:, 3:4]
        on = dat_ref[:, 4:5]
        nn = tuple(dat_ref[:, 5 + k:6 + k] for k in range(3))
        u_sel = dat_ref[:, 8:9]
        u1 = dat_ref[:, 9:10]
        u2 = dat_ref[:, 10:11]
        dw = tuple(dat_ref[:, 11 + k:12 + k] for k in range(3))
        eps = dat_ref[:, 14:15]

        K = rpp * 128
        inv4pi = jnp.float32(1.0 / (4.0 * 3.141592653589793))
        lane = jax.lax.broadcasted_iota(jnp.int32, (BL, 128), 1)

        def cross(u, v):
            return (u[1] * v[2] - u[2] * v[1],
                    u[2] * v[0] - u[0] * v[2],
                    u[0] * v[1] - u[1] * v[0])

        def dot(u, v):
            return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

        def corners(r):
            return tuple(buf[:, p * rpp + r, :] for p in range(9))

        def mt_sweep(o, d, tmax):
            """Moller-Trumbore closest-hit over the block's band
            (identical guards to _make_band_ray_kernel_3d)."""
            best_t = jnp.full((BL, 128), jnp.float32(jnp.inf))
            best_flat = jnp.full((BL, 128), K, jnp.int32)
            for r in range(rpp):
                c = corners(r)
                a = c[0:3]
                e1 = tuple(c[3 + k] - c[k] for k in range(3))
                e2 = tuple(c[6 + k] - c[k] for k in range(3))
                p = cross(d, e2)
                det = dot(e1, p)
                safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
                tv = tuple(o[k] - a[k] for k in range(3))
                uu = dot(tv, p) / safe
                qv = cross(tv, e1)
                vv = dot(d, qv) / safe
                t = dot(e2, qv) / safe
                hit = ((jnp.abs(det) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
                       & (uu + vv <= 1.0) & (t > 1e-6) & (t <= tmax))
                tt = jnp.where(hit, t, jnp.float32(jnp.inf))
                better = tt < best_t
                best_t = jnp.where(better, tt, best_t)
                best_flat = jnp.where(better, r * 128 + lane, best_flat)
            best = jnp.min(best_t, axis=1, keepdims=True)       # (BL, 1)
            slot = jnp.min(jnp.where(best_t <= best, best_flat, K),
                           axis=1, keepdims=True)
            return best, slot

        # ---- in-ball Green-weighted CDF sample (band_ball semantics) ----
        ws = []
        total = jnp.zeros((BL, 1), jnp.float32)
        for r in range(rpp):
            c = corners(r)
            d2 = _tri_d2_tile(q3[0], q3[1], q3[2], c)
            ddist = jnp.sqrt(d2)
            e1 = tuple(c[3 + k] - c[k] for k in range(3))
            e2 = tuple(c[6 + k] - c[k] for k in range(3))
            cr = cross(e1, e2)
            area = 0.5 * jnp.sqrt(dot(cr, cr))
            g = (1.0 / jnp.maximum(ddist, 1e-4) - 1.0 / R) * inv4pi
            w = jnp.where(ddist < R, area * jnp.maximum(g, 0.0), 0.0)
            ws.append(w)
            total = total + jnp.sum(w, axis=1, keepdims=True)

        target = u_sel * total
        rows_le = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tri = (rows_le <= cols).astype(jnp.float32)
        idx = jnp.zeros((BL, 1), jnp.int32)
        off = jnp.zeros((BL, 1), jnp.float32)
        for r in range(rpp):
            cdf = off + jax.lax.dot(ws[r], tri,
                                    precision=jax.lax.Precision.HIGHEST)
            idx = idx + jnp.sum((target >= cdf).astype(jnp.int32), axis=1,
                                keepdims=True)
            off = cdf[:, 127:128]
        idx = jnp.minimum(idx, K - 1)

        w_sel = jnp.zeros((BL, 1), jnp.float32)
        sel_c = [jnp.zeros((BL, 1), jnp.float32) for _ in range(9)]
        for r in range(rpp):
            selm = (r * 128 + lane) == idx
            w_sel = w_sel + jnp.sum(jnp.where(selm, ws[r], 0.0), axis=1,
                                    keepdims=True)
            c = corners(r)
            for p in range(9):
                sel_c[p] = sel_c[p] + jnp.sum(
                    jnp.where(selm, c[p], 0.0), axis=1, keepdims=True)
        a3, b3, c3 = sel_c[0:3], sel_c[3:6], sel_c[6:9]

        # sample point on the winning triangle (prim_sample_point 3D)
        su = jnp.sqrt(u1)
        b0 = 1.0 - su
        b1 = u2 * su
        b2 = 1.0 - b0 - b1
        sp = tuple(a3[k] * b0 + b3[k] * b1 + c3[k] * b2 for k in range(3))
        # winning tri's plane normal (UNNORMALIZED cross, same orientation
        # as gs.prim_normal) + q's plane side (primitives.tri_side)
        e1w = tuple(b3[k] - a3[k] for k in range(3))
        e2w = tuple(c3[k] - a3[k] for k in range(3))
        nw = cross(e1w, e2w)
        side = jnp.sign(dot(tuple(q3[k] - a3[k] for k in range(3)), nw))

        # ---- visibility ray origin -> sample point (any hit == closest
        # hit test under tmax = dist - eps) ----
        o = tuple(q3[k] + on * eps * nn[k] for k in range(3))
        ray = tuple(sp[k] - o[k] for k in range(3))
        dist = jnp.sqrt(dot(ray, ray))
        rd = tuple(ray[k] / jnp.maximum(dist, 1e-20) for k in range(3))
        vis_t, _ = mt_sweep(o, rd, dist - eps)
        occl = jnp.isfinite(vis_t).astype(jnp.float32)

        # ---- walk ray ----
        walk_t, wslot = mt_sweep(o, dw, R)
        whit = jnp.isfinite(walk_t)
        wn = [jnp.zeros((BL, 1), jnp.float32) for _ in range(9)]
        for r in range(rpp):
            selm = (r * 128 + lane) == jnp.minimum(wslot, K - 1)
            c = corners(r)
            for p in range(9):
                wn[p] = wn[p] + jnp.sum(jnp.where(selm, c[p], 0.0), axis=1,
                                        keepdims=True)
        wcr = cross(tuple(wn[3 + k] - wn[k] for k in range(3)),
                    tuple(wn[6 + k] - wn[k] for k in range(3)))
        wlen = jnp.sqrt(jnp.maximum(dot(wcr, wcr), 1e-38))
        wnormal = tuple(jnp.where(whit, wcr[k] / wlen, 0.0)
                        for k in range(3))

        rows = [w_sel, total, sp[0], sp[1], sp[2], side,
                nw[0], nw[1], nw[2], occl,
                whit.astype(jnp.float32),
                jnp.where(whit, walk_t, jnp.float32(jnp.inf)),
                wnormal[0], wnormal[1], wnormal[2]]
        # per-row stores: the one-shot forms (x[None, :, 0] mixed indexing,
        # then a 15-way concatenate) both fail Mosaic lowering on real TPU
        # ("Shape mismatch in input, indices and output" /
        # "result/input offset mismatch on non-concat dimension" — the
        # interpret path masked both); 15 static (1, 1, BL) stores lower
        # like the other band kernels' output writes
        for i, r_ in enumerate(rows):
            out_ref[pl.ds(b, 1), pl.ds(i, 1), :] = r_[:, 0][None, None, :]
        slot_ref[pl.ds(b, 1), :] = idx[:, 0][None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("rpp", "interpret"))
def band_neumann_walk_dma_3d(lin, q, R, on_n, n_normal, u_sel, u1, u2,
                             d_walk, eps, coords, rpp: int, *,
                             interpret: bool = False):
    """Fused Neumann-step band query (see the kernel docstring).

    lin: (N,) int32 (< 0 skips the DMA — callers mask); q, n_normal,
    d_walk: (N, 3) f32; R, on_n (0/1), u_sel, u1, u2, eps: (N,) f32.
    Returns (out (N, 15) f32, slot (N,) int32)."""
    n = lin.shape[0]
    n_rows = coords.shape[1]
    if n_rows < 9 * rpp:
        raise ValueError(f"coords table {coords.shape} too small for "
                         f"rpp={rpp}")
    BL = BAND_DMA_BLOCK
    LC = min(DMA_LANE_CHUNK, -(-n // BL) * BL)
    n_pad = -(-n // LC) * LC

    lin_p = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(lin)
    dat = jnp.zeros((n_pad, 16), jnp.float32)
    dat = (dat.at[:n, 0:3].set(q).at[:n, 3].set(R)
           .at[:n, 4].set(on_n.astype(jnp.float32))
           .at[:n, 5:8].set(n_normal).at[:n, 8].set(u_sel)
           .at[:n, 9].set(u1).at[:n, 10].set(u2)
           .at[:n, 11:14].set(d_walk).at[:n, 14].set(eps))

    call = pl.pallas_call(
        _make_band_neumann_walk_kernel_3d(rpp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(LC // BL,),
            in_specs=[
                pl.BlockSpec((BL, 16), lambda i, lin_ref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((LC // BL, 15, BL), lambda i, lin_ref: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LC // BL, BL), lambda i, lin_ref: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((BL, n_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((LC // BL, 15, BL), jnp.float32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=250 * LC * rpp * 128 + LC * rpp * 128 * 128 * 2,
            bytes_accessed=LC * n_rows * 128 * 4 + LC * 64,
            transcendentals=3 * LC * rpp * 128,
        ),
        interpret=interpret,
    )

    if n_pad == LC:
        outs = call(lin_p, dat, coords)
    else:
        lin_r = lin_p.reshape(-1, LC)
        dat_r = dat.reshape(-1, LC, 16)

        def body(carry, xs):
            l_c, d_c = xs
            return carry, call(l_c, d_c, coords)

        _, outs = jax.lax.scan(body, 0, (lin_r, dat_r))
    f32o, slot = outs
    f32o = jnp.moveaxis(f32o.reshape(-1, 15, BL), 1, 2).reshape(-1, 15)[:n]
    slot = slot.reshape(-1)[:n]
    return f32o, slot


def _make_band_ball_kernel_3d(rpp: int):
    """Green-weighted in-ball CDF sampling over the per-lane band.

    Weights w = tri_area * max(G(d; R), 0) for prims with point-distance
    d < R (geometry/queries.band_sample_in_ball semantics; Green clamp
    1e-4 = solver.green.GREEN_R_CLAMP).  The CDF index is
    sum(target >= cdf) exactly like the gather path; prefix sums run as
    a (BL, 128) x (128, 128) upper-triangular matmul on the MXU (no
    lane-axis cumsum primitive).  Padded slots have coincident corners
    -> area 0 -> weight 0.  Outputs (slot, w_sel, total); callers derive
    pid = rows[lin, slot] and pdf_area = w_sel / (total * prim_measure).
    """

    def kernel(lin_ref, qr_ref, tab_ref, slot_ref, wsel_ref, total_ref,
               buf, sems):
        b = pl.program_id(0)
        BL = qr_ref.shape[0]
        _band_dma_loops(lin_ref, tab_ref, buf, sems, b, BL)

        qx = qr_ref[:, 0:1]
        qy = qr_ref[:, 1:2]
        qz = qr_ref[:, 2:3]
        R = qr_ref[:, 3:4]
        u = qr_ref[:, 4:5]
        K = rpp * 128
        inv4pi = jnp.float32(1.0 / (4.0 * 3.141592653589793))

        ws = []
        total = jnp.zeros((BL, 1), jnp.float32)
        for r in range(rpp):
            c = tuple(buf[:, p * rpp + r, :] for p in range(9))
            d2 = _tri_d2_tile(qx, qy, qz, c)
            dd = jnp.sqrt(d2)
            e1 = tuple(c[3 + k] - c[k] for k in range(3))
            e2 = tuple(c[6 + k] - c[k] for k in range(3))
            cx = e1[1] * e2[2] - e1[2] * e2[1]
            cy = e1[2] * e2[0] - e1[0] * e2[2]
            cz = e1[0] * e2[1] - e1[1] * e2[0]
            area = 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)
            g = (1.0 / jnp.maximum(dd, 1e-4) - 1.0 / R) * inv4pi
            w = jnp.where(dd < R, area * jnp.maximum(g, 0.0), 0.0)
            ws.append(w)
            total = total + jnp.sum(w, axis=1, keepdims=True)

        target = u * total                                  # (BL, 1)
        rows_le = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tri = (rows_le <= cols).astype(jnp.float32)         # U[i,j] = i<=j
        idx = jnp.zeros((BL, 1), jnp.int32)
        off = jnp.zeros((BL, 1), jnp.float32)
        for r in range(rpp):
            cdf = off + jax.lax.dot(ws[r], tri,
                                    precision=jax.lax.Precision.HIGHEST)
            idx = idx + jnp.sum((target >= cdf).astype(jnp.int32), axis=1,
                                keepdims=True)
            off = cdf[:, 127:128]
        idx = jnp.minimum(idx, K - 1)                       # (BL, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BL, 128), 1)
        w_sel = jnp.zeros((BL, 1), jnp.float32)
        for r in range(rpp):
            sel = (r * 128 + lane) == idx
            w_sel = w_sel + jnp.sum(jnp.where(sel, ws[r], 0.0), axis=1,
                                    keepdims=True)
        slot_ref[pl.ds(b, 1), :] = idx[:, 0][None, :]
        wsel_ref[pl.ds(b, 1), :] = w_sel[:, 0][None, :]
        total_ref[pl.ds(b, 1), :] = total[:, 0][None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("rpp", "interpret"))
def band_ball_dma_3d(lin, q, R, u, coords, rpp: int, *,
                     interpret: bool = False):
    """Prim-band Green-weighted in-ball sampling via per-lane block DMA.

    lin: (N,) int32 cell per lane (< 0 skips the DMA); q: (N, 3) f32;
    R, u: (N,) f32; coords as band_ray_dma_3d.  Returns (slot (N,) int32,
    w_sel (N,), total (N,)).
    """
    n = lin.shape[0]
    n_rows = coords.shape[1]
    if n_rows < 9 * rpp:
        raise ValueError(f"coords table {coords.shape} too small for "
                         f"rpp={rpp}")
    BL = BAND_DMA_BLOCK
    LC = min(DMA_LANE_CHUNK, -(-n // BL) * BL)
    n_pad = -(-n // LC) * LC

    lin_p = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(lin)
    qr = jnp.zeros((n_pad, 5), jnp.float32)
    qr = qr.at[:n, 0:3].set(q).at[:n, 3].set(R).at[:n, 4].set(u)

    call = pl.pallas_call(
        _make_band_ball_kernel_3d(rpp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(LC // BL,),
            in_specs=[
                pl.BlockSpec((BL, 5), lambda i, lin_ref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=tuple(
                pl.BlockSpec((LC // BL, BL), lambda i, lin_ref: (0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)),
            scratch_shapes=[
                pltpu.VMEM((BL, n_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.int32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
            jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=80 * LC * rpp * 128 + LC * rpp * 128 * 128 * 2,
            bytes_accessed=LC * n_rows * 128 * 4 + LC * 20,
            transcendentals=2 * LC * rpp * 128,
        ),
        interpret=interpret,
    )

    if n_pad == LC:
        outs = call(lin_p, qr, coords)
    else:
        lin_r = lin_p.reshape(-1, LC)
        qr_r = qr.reshape(-1, LC, 5)

        def body(carry, xs):
            l_c, qr_c = xs
            return carry, call(l_c, qr_c, coords)

        _, outs = jax.lax.scan(body, 0, (lin_r, qr_r))
    slot, w_sel, total = (x.reshape(-1)[:n] for x in outs)
    return slot, w_sel, total
