"""Bitmask-predicated resolve kernels for the Dirichlet query hot path.

Round-2 redesign, shaped by measurements on v5e (tools/tpu_newpath_lab.py,
tools/tpu_mosaic_probe.py, tools/tpu_step_bisect2.py):

* a 65k-lane XLA gather costs ~19 ns/lane NO MATTER the table size, so the
  dense FinePack entry gather (fine_decode) stays in XLA — per-lane DMA
  of a 4 B entry is Mosaic-illegal (1D HBM tables tile at 1024 elements)
  and tile-sized workarounds cost more than the gather;
* per-lane DMAs pay ~100-200 ns of scalar issue each, so they are only
  ever issued for lanes that truly need them: ``sweep_resolve`` walks a
  GROUP-bitmask and fetches the candidate-row coordinate block plus the
  row's candidate-id tile ONLY where the FinePack need bit (or the
  out-of-grid force) fired — a few % of lanes in steady state, vs the
  round-1 kernel's always-on per-lane loop (~87 ns/lane floor);
* fixed per-call and per-block costs dominate at low set-fractions, so a
  single pallas_call covers all 65k lanes and every block's entire body
  (bit scans, DMAs, dense winner-select) is skipped via a per-block
  any-set flag — an all-empty invocation costs only the dispatch;
* the winning candidate's prim id is extracted in-kernel from the DMA'd
  id tile with a one-hot vector reduction (dynamic scalar VMEM reads do
  not lower; tools/tpu_mosaic_probe.py probe A), so the downstream color
  fetch needs no (19 ns/lane) cand gather;
* ``fetch_colors`` resolves the side-selected vertex-color pair for the
  (rarer still) in-shell lanes with one 8-row-aligned DMA from a
  (2P, 128) color table (Mosaic allows (8,128) slices of 2D tables at
  dynamic 8-aligned rows; probe B) and a one-hot row select.

Reference counterpart: the closest-point query + computeSurfaceColor
pipeline (uniform/integrator.cu:138-157, integrator/common.h:242-260).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8          # lanes per bitmask word (small group -> sparse-friendly)
RBL = 256          # lanes per block, sweep kernel (VMEM-scoped: 2 tile
#                    buffers + dense-phase temporaries must fit ~16MB)
RBL3 = 128         # lanes per block, 3D sweep kernel: the 9-corner
#                    triangle math carries ~2.5x more live tiles than the
#                    2D segment sweep (measured 29.7M scoped vmem at 256)
CBL = 256          # lanes per block, color kernel
LANE_CHUNK = 65536  # lanes per pallas_call (bounds SMEM scalar prefetch)


def kprime_for(K: int) -> int:
    """Per-row stride in the candidate-id pack: the smallest divisor of
    1024 >= K, so a row's ids never straddle a (8, 128) int32 tile."""
    for k in (128, 256, 512, 1024):
        if K <= k:
            return k
    raise ValueError(f"K={K} too large for the packed candidate fetch")


def pack_groups(mask):
    """(N,) bool -> (N/GROUP,) int32 bitmask words (vector ops only)."""
    n = mask.shape[0]
    bits = mask.reshape(n // GROUP, GROUP).astype(jnp.int32)
    w = bits[:, 0]
    for i in range(1, GROUP):
        w = w | (bits[:, i] << i)
    return w


def _block_any(mask_words, bl: int):
    """(W,) int32 words -> (W*GROUP/bl,) int32 any-set flag per bl lanes."""
    return jnp.any(mask_words.reshape(-1, bl // GROUP) != 0,
                   axis=1).astype(jnp.int32)


def _scan_bits(mask_ref, base_word, n_words, fn):
    """Run fn(lane) for every set bit; empty GROUPs cost one scalar test.

    Fully unrolled: round 1 measured ~10 ns/lane extra for rolled scalar
    loops (tools/tpu_kernel_variants.py), and the whole point of the
    bitmask is to make the not-set case nearly free."""

    def grp(g, carry):
        m = mask_ref[base_word + g]

        @pl.when(m != 0)
        def _():
            def bit(i, c):
                @pl.when(((m >> i) & 1) != 0)
                def _():
                    fn(g * GROUP + i)
                return c

            jax.lax.fori_loop(0, GROUP, bit, 0, unroll=GROUP)
        return carry

    jax.lax.fori_loop(0, n_words, grp, 0, unroll=n_words)


def _onehot_pick(buf, flat):
    """buf (B, 8, 128), flat (B,) int32 element index in [0, 1024) ->
    (B,) value at [l, flat//128, flat%128], via vector ops only."""
    sub = (flat // 128)[:, None]
    col = (flat % 128)[:, None]
    acc = jnp.zeros(buf.shape[:1] + (128,), buf.dtype)
    for s in range(8):
        acc = acc + buf[:, s, :] * (sub == s).astype(buf.dtype)
    lanecol = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    return jnp.sum(jnp.where(lanecol == col, acc, 0), axis=1)


def _sweep_kernel(mask_ref, row_ref, cnt_ref, q_ref, rowv_ref, coords_ref,
                  cpack_ref, dex_ref, t_ref, side_ref, pid_ref, cbuf, kbuf,
                  sem_c, sem_k, *, rpp: int, kprime: int):
    b = pl.program_id(0)

    @pl.when(cnt_ref[b] != 0)
    def _():
        ngrp = RBL // GROUP
        base_word = b * ngrp
        rows_per_tile = 1024 // kprime

        def issue(l):
            r = row_ref[b * RBL + l]
            pltpu.make_async_copy(coords_ref.at[r], cbuf.at[l],
                                  sem_c).start()
            pltpu.make_async_copy(cpack_ref.at[r // rows_per_tile],
                                  kbuf.at[l], sem_k).start()

        _scan_bits(mask_ref, base_word, ngrp, issue)

        def wait(l):
            r = row_ref[b * RBL + l]
            pltpu.make_async_copy(coords_ref.at[r], cbuf.at[l],
                                  sem_c).wait()
            pltpu.make_async_copy(cpack_ref.at[r // rows_per_tile],
                                  kbuf.at[l], sem_k).wait()

        _scan_bits(mask_ref, base_word, ngrp, wait)

        # dense closest-segment sweep over the fetched rows (garbage on
        # unfetched lanes; callers mask on the request bits)
        qx = q_ref[:, 0:1]
        qy = q_ref[:, 1:2]
        K = rpp * 128
        best_d2 = jnp.full((RBL, 128), jnp.float32(jnp.inf))
        best_flat = jnp.full((RBL, 128), K, jnp.int32)
        best_t = jnp.zeros((RBL, 128), jnp.float32)
        best_side = jnp.zeros((RBL, 128), jnp.float32)
        lanecol = jax.lax.broadcasted_iota(jnp.int32, (RBL, 128), 1)
        for r in range(rpp):
            ax = cbuf[:, 0 * rpp + r, :]
            ay = cbuf[:, 1 * rpp + r, :]
            bx = cbuf[:, 2 * rpp + r, :]
            by = cbuf[:, 3 * rpp + r, :]
            ex = bx - ax
            ey = by - ay
            wx = qx - ax
            wy = qy - ay
            den = jnp.maximum(ex * ex + ey * ey, 1e-30)
            t = jnp.clip((wx * ex + wy * ey) / den, 0.0, 1.0)
            dx = wx - t * ex
            dy = wy - t * ey
            d2 = dx * dx + dy * dy
            side = ex * wy - ey * wx
            better = d2 < best_d2
            best_d2 = jnp.where(better, d2, best_d2)
            best_flat = jnp.where(better, r * 128 + lanecol, best_flat)
            best_t = jnp.where(better, t, best_t)
            best_side = jnp.where(better, side, best_side)
        best = jnp.min(best_d2, axis=1)
        hit = best_d2 <= best[:, None]
        slot = jnp.min(jnp.where(hit, best_flat, K), axis=1)
        slot = jnp.minimum(slot, K - 1)
        wcol = slot - (slot // 128) * 128
        sel = (lanecol == wcol[:, None]) & hit
        t_win = jnp.sum(jnp.where(sel, best_t, 0.0), axis=1)
        side_win = jnp.sum(jnp.where(sel, best_side, 0.0), axis=1)

        # winner's prim id from the row's candidate-id tile
        rowv = rowv_ref[:, 0]
        flat = (rowv % rows_per_tile) * kprime + slot
        pid = _onehot_pick(kbuf, flat)

        dex_ref[pl.ds(b, 1), :] = jnp.sqrt(best)[None, :]
        t_ref[pl.ds(b, 1), :] = t_win[None, :]
        side_ref[pl.ds(b, 1), :] = side_win[None, :]
        pid_ref[pl.ds(b, 1), :] = pid[None, :]


@functools.partial(jax.jit,
                   static_argnames=("rpp", "kprime", "interpret"))
def sweep_resolve(mask_words, row, q, coords, cpack, *, rpp: int,
                  kprime: int, interpret: bool = False):
    """Exact Dirichlet closest-segment resolve for bit-masked lanes.

    mask_words: (N/GROUP,) int32 from pack_groups (lanes whose FinePack
    need bit or out-of-grid force fired); row: (N,) int32 candidate row;
    q: (N, 2) f32; coords: (R, n_rows, 128) f32 coordinate planes
    (attach_coords); cpack: (M, 8, 128) int32 candidate-id tiles with
    per-row stride ``kprime`` (attach_shading).

    Returns (d_exact, t, side, pid), each (N,) (garbage on unmasked
    lanes): the exact distance, winning-segment parameter in [0, 1] (the
    2D uv), sign of the winner's cross product (prim_side convention),
    and the winning candidate's prim id.
    """
    n = row.shape[0]
    n_rows = coords.shape[1]
    LC = min(LANE_CHUNK, -(-n // RBL) * RBL)
    n_pad = -(-n // LC) * LC
    nw = n // GROUP

    mask_p = jnp.zeros((n_pad // GROUP,), jnp.int32).at[:nw].set(mask_words)
    row_p = jnp.zeros((n_pad,), jnp.int32).at[:n].set(row)
    q_p = jnp.zeros((n_pad, 2), jnp.float32).at[:n].set(q)
    G = LC // RBL

    out_spec = pl.BlockSpec((G, RBL), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    out_f32 = jax.ShapeDtypeStruct((G, RBL), jnp.float32)
    out_i32 = jax.ShapeDtypeStruct((G, RBL), jnp.int32)
    call = pl.pallas_call(
        functools.partial(_sweep_kernel, rpp=rpp, kprime=kprime),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((RBL, 2), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RBL, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(out_spec,) * 4,
            scratch_shapes=[
                pltpu.VMEM((RBL, n_rows, 128), jnp.float32),
                pltpu.VMEM((RBL, 8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(out_f32, out_f32, out_f32, out_i32),
        cost_estimate=pl.CostEstimate(
            flops=20 * LC * rpp * 128,
            bytes_accessed=LC * (n_rows * 128 // 8) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def one(m_c, r_c, q_c):
        cnt = _block_any(m_c, RBL)
        return call(m_c, r_c, cnt, q_c, r_c.reshape(-1, 1), coords, cpack)

    # optimization_barrier on the custom call's operands/results: XLA's
    # TpuInstructionFusion CustomCallConsumerFusion analysis CHECK-fails
    # when it merges surrounding slice fusions into the multi-output
    # tpu_custom_call (observed on v5e, 2026-08); the barrier keeps the
    # call an island.
    if n_pad == LC:
        mask_p, row_p, q_p = jax.lax.optimization_barrier(
            (mask_p, row_p, q_p))
        outs = jax.lax.optimization_barrier(one(mask_p, row_p, q_p))
    else:
        mask_r = mask_p.reshape(-1, LC // GROUP)
        row_r = row_p.reshape(-1, LC)
        q_r = q_p.reshape(-1, LC, 2)

        def body(carry, xs):
            m_c, r_c, q_c = jax.lax.optimization_barrier(xs)
            return carry, jax.lax.optimization_barrier(one(m_c, r_c, q_c))

        _, outs = jax.lax.scan(body, 0, (mask_r, row_r, q_r))
    return tuple(o.reshape(-1)[:n] for o in outs)


def _sweep_kernel_3d(mask_ref, row_ref, cnt_ref, q_ref, rowv_ref,
                     coords_ref, cpack_ref, dex_ref, pid_ref, *rest,
                     rpp: int, kprime: int):
    """3D variant of _sweep_kernel: 9 coordinate planes (triangle
    corners), point-triangle distance (_tri_d2_tile), winner corners out
    (uv / side / interior run in XLA on the compacted lanes — unlike the
    2D kernel there are 9 of them, past the profitable in-kernel width)."""
    from .pallas_queries import _tri_d2_tile

    corner_refs = rest[:9]
    cbuf, kbuf, sem_c, sem_k = rest[9:13]
    b = pl.program_id(0)

    @pl.when(cnt_ref[b] != 0)
    def _():
        ngrp = RBL3 // GROUP
        base_word = b * ngrp
        rows_per_tile = 1024 // kprime

        def issue(l):
            r = row_ref[b * RBL3 + l]
            pltpu.make_async_copy(coords_ref.at[r], cbuf.at[l],
                                  sem_c).start()
            pltpu.make_async_copy(cpack_ref.at[r // rows_per_tile],
                                  kbuf.at[l], sem_k).start()

        _scan_bits(mask_ref, base_word, ngrp, issue)

        def wait(l):
            r = row_ref[b * RBL3 + l]
            pltpu.make_async_copy(coords_ref.at[r], cbuf.at[l],
                                  sem_c).wait()
            pltpu.make_async_copy(cpack_ref.at[r // rows_per_tile],
                                  kbuf.at[l], sem_k).wait()

        _scan_bits(mask_ref, base_word, ngrp, wait)

        qx = q_ref[:, 0:1]
        qy = q_ref[:, 1:2]
        qz = q_ref[:, 2:3]
        K = rpp * 128
        best_d2 = jnp.full((RBL3, 128), jnp.float32(jnp.inf))
        best_flat = jnp.full((RBL3, 128), K, jnp.int32)
        best_c = [jnp.zeros((RBL3, 128), jnp.float32) for _ in range(9)]
        lanecol = jax.lax.broadcasted_iota(jnp.int32, (RBL3, 128), 1)
        for r in range(rpp):
            c = tuple(cbuf[:, p * rpp + r, :] for p in range(9))
            d2 = _tri_d2_tile(qx, qy, qz, c)
            better = d2 < best_d2
            best_d2 = jnp.where(better, d2, best_d2)
            best_flat = jnp.where(better, r * 128 + lanecol, best_flat)
            best_c = [jnp.where(better, c[p], best_c[p]) for p in range(9)]
        best = jnp.min(best_d2, axis=1)
        hit = best_d2 <= best[:, None]
        slot = jnp.min(jnp.where(hit, best_flat, K), axis=1)
        slot = jnp.minimum(slot, K - 1)
        wcol = slot - (slot // 128) * 128
        sel = (lanecol == wcol[:, None]) & hit

        rowv = rowv_ref[:, 0]
        flat = (rowv % rows_per_tile) * kprime + slot
        pid = _onehot_pick(kbuf, flat)

        dex_ref[pl.ds(b, 1), :] = jnp.sqrt(best)[None, :]
        pid_ref[pl.ds(b, 1), :] = pid[None, :]
        for p in range(9):
            corner_refs[p][pl.ds(b, 1), :] = jnp.sum(
                jnp.where(sel, best_c[p], 0.0), axis=1)[None, :]


@functools.partial(jax.jit,
                   static_argnames=("rpp", "kprime", "interpret"))
def sweep_resolve_3d(mask_words, row, q, coords, cpack, *, rpp: int,
                     kprime: int, interpret: bool = False):
    """Exact 3D Dirichlet closest-triangle resolve for bit-masked lanes.

    Same contract as sweep_resolve but for triangle boundaries: coords is
    the 9-plane table (corner k, axis d at plane k*3+d).  Returns
    (d_exact, pid, pv) with pv a 3-tuple of per-corner (N, 3) arrays
    (the prim_project verts convention; garbage on unmasked lanes).
    """
    n = row.shape[0]
    n_rows = coords.shape[1]
    LC = min(LANE_CHUNK, -(-n // RBL3) * RBL3)
    n_pad = -(-n // LC) * LC
    nw = n // GROUP

    mask_p = jnp.zeros((n_pad // GROUP,), jnp.int32).at[:nw].set(mask_words)
    row_p = jnp.zeros((n_pad,), jnp.int32).at[:n].set(row)
    q_p = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(q)
    G = LC // RBL3

    out_spec = pl.BlockSpec((G, RBL3), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    out_f32 = jax.ShapeDtypeStruct((G, RBL3), jnp.float32)
    out_i32 = jax.ShapeDtypeStruct((G, RBL3), jnp.int32)
    call = pl.pallas_call(
        functools.partial(_sweep_kernel_3d, rpp=rpp, kprime=kprime),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((RBL3, 3), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RBL3, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(out_spec,) * 11,
            scratch_shapes=[
                pltpu.VMEM((RBL3, n_rows, 128), jnp.float32),
                pltpu.VMEM((RBL3, 8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(out_f32, out_i32) + (out_f32,) * 9,
        cost_estimate=pl.CostEstimate(
            flops=60 * LC * rpp * 128,
            bytes_accessed=LC * (n_rows * 128 // 8) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def one(m_c, r_c, q_c):
        cnt = _block_any(m_c, RBL3)
        return call(m_c, r_c, cnt, q_c, r_c.reshape(-1, 1), coords, cpack)

    if n_pad == LC:
        mask_p, row_p, q_p = jax.lax.optimization_barrier(
            (mask_p, row_p, q_p))
        outs = jax.lax.optimization_barrier(one(mask_p, row_p, q_p))
    else:
        mask_r = mask_p.reshape(-1, LC // GROUP)
        row_r = row_p.reshape(-1, LC)
        q_r = q_p.reshape(-1, LC, 3)

        def body(carry, xs):
            m_c, r_c, q_c = jax.lax.optimization_barrier(xs)
            return carry, jax.lax.optimization_barrier(one(m_c, r_c, q_c))

        _, outs = jax.lax.scan(body, 0, (mask_r, row_r, q_r))
    flat = tuple(o.reshape(-1)[:n] for o in outs)
    # 3-tuple of per-corner (N, 3) arrays — the prim_project/prim_side
    # verts convention (geometry/primitives.py)
    pv = tuple(jnp.stack(flat[2 + 3 * k:2 + 3 * k + 3], axis=-1)
               for k in range(3))
    return flat[0], flat[1], pv


def _make_color_kernel(cols: tuple):
    """Color-fetch kernel extracting the given row columns (2D: 2 corner
    colors at cols 0-2/4-6; 3D: 3 corners at 0-2/4-6/8-10)."""

    def kernel(mask_ref, cfi_ref, cnt_ref, cfiv_ref, crows_ref, *rest):
        out_refs = rest[:len(cols)]
        cbuf, sem = rest[len(cols)], rest[len(cols) + 1]
        b = pl.program_id(0)

        @pl.when(cnt_ref[b] != 0)
        def _():
            ngrp = CBL // GROUP
            base_word = b * ngrp

            def issue(l):
                base = (cfi_ref[b * CBL + l] // 8) * 8
                base = pl.multiple_of(base, 8)
                pltpu.make_async_copy(crows_ref.at[pl.ds(base, 8)],
                                      cbuf.at[l], sem).start()

            _scan_bits(mask_ref, base_word, ngrp, issue)

            def wait(l):
                base = (cfi_ref[b * CBL + l] // 8) * 8
                base = pl.multiple_of(base, 8)
                pltpu.make_async_copy(crows_ref.at[pl.ds(base, 8)],
                                      cbuf.at[l], sem).wait()

            _scan_bits(mask_ref, base_word, ngrp, wait)

            sub = (cfiv_ref[:, 0] % 8)[:, None]
            acc = jnp.zeros((CBL, 128), jnp.float32)
            for s in range(8):
                acc = acc + cbuf[:, s, :] * (sub == s).astype(jnp.float32)
            # static integer indexing of the lane axis lowers to a gather
            # Mosaic rejects; extract each column as a one-hot masked
            # reduction
            lanecol = jax.lax.broadcasted_iota(jnp.int32, (CBL, 128), 1)

            for oi, c in enumerate(cols):
                out_refs[oi][pl.ds(b, 1), :] = jnp.sum(
                    jnp.where(lanecol == c, acc, 0.0), axis=1)[None, :]

    return kernel


_color_kernel = _make_color_kernel((0, 1, 2, 4, 5, 6))


def _fetch_colors_impl(mask_words, cfi, color_rows, cols: tuple,
                       interpret: bool):
    n = cfi.shape[0]
    LC = min(LANE_CHUNK, -(-n // CBL) * CBL)
    n_pad = -(-n // LC) * LC
    nw = n // GROUP
    n_out = len(cols)

    mask_p = jnp.zeros((n_pad // GROUP,), jnp.int32).at[:nw].set(mask_words)
    cfi_p = jnp.zeros((n_pad,), jnp.int32).at[:n].set(cfi)
    G = LC // CBL

    out_f32 = jax.ShapeDtypeStruct((G, CBL), jnp.float32)
    out_spec = pl.BlockSpec((G, CBL), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        _make_color_kernel(cols),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((CBL, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(out_spec,) * n_out,
            scratch_shapes=[
                pltpu.VMEM((CBL, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=(out_f32,) * n_out,
        cost_estimate=pl.CostEstimate(
            flops=n, bytes_accessed=n * 40, transcendentals=0),
        interpret=interpret,
    )

    def one(m_c, f_c):
        cnt = _block_any(m_c, CBL)
        return call(m_c, f_c, cnt, f_c.reshape(-1, 1), color_rows)

    if n_pad == LC:
        mask_p, cfi_p = jax.lax.optimization_barrier((mask_p, cfi_p))
        outs = jax.lax.optimization_barrier(one(mask_p, cfi_p))
    else:
        mask_r = mask_p.reshape(-1, LC // GROUP)
        cfi_r = cfi_p.reshape(-1, LC)

        def body(carry, xs):
            m_c, f_c = jax.lax.optimization_barrier(xs)
            return carry, jax.lax.optimization_barrier(one(m_c, f_c))

        _, outs = jax.lax.scan(body, 0, (mask_r, cfi_r))
    outs = [o.reshape(-1)[:n] for o in outs]
    return tuple(jnp.stack(outs[3 * k:3 * k + 3], axis=-1)
                 for k in range(n_out // 3))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fetch_colors(mask_words, cfi, color_rows, *, interpret: bool = False):
    """Side-selected endpoint colors of the winning candidate primitive.

    mask_words: (N/GROUP,) int32 (in-shell lanes); cfi: (N,) int32 color
    row 2*pid + side; color_rows: (2P_pad8, 128) f32 rows
    [c0.rgb, pad, c1.rgb, pad, 0...] per (prim, side).

    Returns (c0, c1): (N, 3) endpoint colors (garbage on unmasked lanes).
    """
    return _fetch_colors_impl(mask_words, cfi, color_rows,
                              (0, 1, 2, 4, 5, 6), interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fetch_colors3(mask_words, cfi, color_rows, *, interpret: bool = False):
    """3D variant: three corner colors per (prim, side) row
    [ca.rgb, 0, cb.rgb, 0, cc.rgb, 0, ...].  Returns (ca, cb, cc)."""
    return _fetch_colors_impl(mask_words, cfi, color_rows,
                              (0, 1, 2, 4, 5, 6, 8, 9, 10), interpret)


# --------------------------------------------------------------------------- #
# lane compaction
# --------------------------------------------------------------------------- #
#
# Scattered set-lanes activate every 256-lane block, and each active block
# pays the full dense winner-select phase (~8 us) regardless of how few of
# its lanes are set — measured 2.4 ms for 6.2k scattered lanes vs 0.4 ms
# for the same count clustered (tools/tpu_resolve_probe.py).  A serial
# scalar pass compacts the set-lane ids so the sweep/color kernels run on
# a dense prefix; results scatter back with one row-scatter.


def _compact_kernel(mask_ref, lanes_ref, cnt_ref, *, n_words: int,
                    cap: int):
    def word(wi, cnt):
        m = mask_ref[wi]

        def bit(i, c):
            take = ((m >> i) & 1) != 0

            @pl.when(take & (c < cap))
            def _():
                lanes_ref[c] = wi * GROUP + i

            return c + jnp.where(take, 1, 0).astype(jnp.int32)

        return jax.lax.fori_loop(0, GROUP, bit, cnt, unroll=GROUP)

    cnt = jax.lax.fori_loop(0, n_words, word, jnp.int32(0))
    cnt_ref[0] = cnt


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def compact_lanes(mask_words, *, cap: int, interpret: bool = False):
    """(W,) int32 bitmask words -> (lanes (cap,) int32, cnt (1,) int32).

    lanes[:cnt] are the set-lane ids in ascending order; entries past cnt
    are garbage (callers mask with arange < cnt).  If more than ``cap``
    lanes are set, only the first cap are listed — check cnt (it keeps
    counting) and fall back to the uncompacted path.
    """
    n_words = mask_words.shape[0]
    call = pl.pallas_call(
        functools.partial(_compact_kernel, n_words=n_words, cap=cap),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
        ),
        out_shape=(jax.ShapeDtypeStruct((cap,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        cost_estimate=pl.CostEstimate(
            flops=n_words * GROUP, bytes_accessed=n_words * 4,
            transcendentals=0),
        interpret=interpret,
    )
    mask_words = jax.lax.optimization_barrier(mask_words)
    return jax.lax.optimization_barrier(call(mask_words))
