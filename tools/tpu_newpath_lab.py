#!/usr/bin/env python
"""Microbenchmarks for the round-2 hot-path redesign hypotheses.

Everything at n = 65536 lanes (256^2), timed inside an 8-iter scan to
amortize the ~25 ms tunnel dispatch.

1. MXU tent-matmul bound-field lookup (replaces the 77 ns/lane fine gather)
2. counter-based hash RNG (replaces threefry streams, ~52 ns/lane)
3. pallas group-bitmask scalar floor (replaces the 87 ns/lane always-on
   per-lane DMA predication loops)
4. while-loop carry layouts: (N, D) vs planar (D, N)
5. guiding network inference cost at lane width
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 65536


def timed_scan(label, body_fn, init_args, length=64, reps=3):
    def outer(*args):
        def body(carry, i):
            return body_fn(carry, i, *args[1:]), None
        out, _ = jax.lax.scan(body, args[0], jnp.arange(length))
        return out

    c = jax.jit(outer).lower(*init_args).compile()
    out = c(*init_args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = c(*init_args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    t = min(ts) / length
    print(f"{label:46s} {t*1e3:9.3f} ms/iter  ({t/N*1e9:6.1f} ns/lane)",
          flush=True)
    return t


# ------------------------------------------------------------------ #
# 1) MXU tent bound field
# ------------------------------------------------------------------ #

def tent_bound(q, B, lo, inv_h, G):
    """Bilinear interpolation of a (G, G) bound field via tent matmuls.

    q (N,2) world; node i at lo + i/inv_h; B bf16 (G, G).
    Valid conservative bound when each node stores min distance over its
    (2-cell) support.
    """
    rel = (q - lo) * inv_h                       # node coords
    i = jnp.arange(G, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, 0:1] - i[None]))   # (N, G)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, 1:2] - i[None]))
    t1 = jnp.dot(wx.astype(jnp.bfloat16), B,
                 preferred_element_type=jnp.float32)              # (N, G)
    return jnp.sum(t1 * wy, axis=-1)


def bench_tent():
    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(key, (N, 2)) * 700.0 - 100.0
    for G in (256, 512):
        B = jax.random.uniform(key, (G, G)).astype(jnp.bfloat16)
        lo = jnp.float32(-100.0)
        inv_h = jnp.float32((G - 1) / 700.0)

        def body(c, i, q, B):
            r = tent_bound(q + c * 1e-9, B, lo, inv_h, G)
            return c + jnp.sum(r)

        timed_scan(f"tent bound field G={G} (bf16 MXU)", body,
                   (jnp.float32(0), q, B))


# ------------------------------------------------------------------ #
# 2) hash RNG
# ------------------------------------------------------------------ #

def _mix(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7feb352d)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846ca68b)
    x = x ^ (x >> 16)
    return x


def hash_uniform(lane, salt):
    h = _mix(lane ^ (salt * jnp.uint32(0x9e3779b9)))
    return (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def bench_rng():
    lane = jnp.arange(N, dtype=jnp.uint32)

    def body_hash(c, i, lane):
        s = jnp.uint32(i)
        acc = jnp.float32(0)
        total = jnp.zeros((N,), jnp.float32)
        for k in range(6):
            total = total + hash_uniform(lane, s * 8 + k)
        return c + jnp.sum(total)

    timed_scan("hash RNG: 6 draws of (N,)", body_hash,
               (jnp.float32(0), lane))

    key = jax.random.PRNGKey(0)

    def body_threefry(c, i, k):
        kk = jax.random.fold_in(k, i)
        ks = jax.random.split(kk, 3)
        u = (jax.random.uniform(ks[0], (N,)) + jax.random.uniform(ks[1], (N,))
             + jnp.sum(jax.random.uniform(ks[2], (N, 4)), -1))
        return c + jnp.sum(u)

    timed_scan("threefry: 6 draws (3 streams)", body_threefry,
               (jnp.float32(0), key))


# ------------------------------------------------------------------ #
# 3) pallas group-bitmask floor
# ------------------------------------------------------------------ #

GROUP = 32          # lanes per bitmask word
BL = 512            # lanes per block


def _mask_kernel_body(mask_ref, cnt_ref, lin_ref, q_ref, tab_ref, out_ref,
                      buf, sem, *, rpp):
    b = pl.program_id(0)
    ngrp = BL // GROUP

    def sweep(g, carry, start):
        m = mask_ref[b * ngrp + g]

        @pl.when(m != 0)
        def _():
            def bit(i, c):
                @pl.when((m >> i) & 1 != 0)
                def _():
                    l = g * GROUP + i
                    cell = lin_ref[b * BL + l]
                    cp = pltpu.make_async_copy(tab_ref.at[cell], buf.at[l],
                                               sem)
                    if start:
                        cp.start()
                    else:
                        cp.wait()
                return c
            jax.lax.fori_loop(0, GROUP, bit, 0, unroll=GROUP)
        return carry

    jax.lax.fori_loop(0, ngrp, lambda g, c: sweep(g, c, True), 0)
    jax.lax.fori_loop(0, ngrp, lambda g, c: sweep(g, c, False), 0)

    qx = q_ref[:, 0:1]
    acc = jnp.zeros((BL, 128), jnp.float32)
    for r in range(4 * rpp):
        acc = acc + buf[:, r, :] * qx
    out_ref[pl.ds(b, 1), :] = jnp.sum(acc, axis=1)[None, :]


@functools.partial(jax.jit, static_argnames=("rpp",))
def mask_sweep(mask, cnt, lin, q, tab, rpp: int):
    n = lin.shape[0]
    n_rows = tab.shape[1]
    grid = (n // BL,)
    return pl.pallas_call(
        functools.partial(_mask_kernel_body, rpp=rpp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BL, 2), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((N // BL, BL), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BL, n_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n // BL, BL), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=16 * n * rpp * 128,
                                      bytes_accessed=n * 64,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(mask, cnt, lin, q, tab)


def bench_mask_kernel():
    rpp = 2
    n_rows = 8
    R = 844636
    tab = jnp.ones((R, n_rows, 128), jnp.float32)
    q = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
    lane = np.arange(N)

    for frac in (0.0, 0.03, 0.1, 1.0):
        rng = np.random.default_rng(0)
        need = rng.random(N) < frac
        lin = np.where(need, rng.integers(0, R, N), 0).astype(np.int32)
        bits = need.reshape(-1, GROUP)
        mask = np.zeros((N // GROUP,), np.uint32)
        for i in range(GROUP):
            mask |= bits[:, i].astype(np.uint32) << i
        mask = mask.astype(np.int32)
        cnt = need.reshape(-1, BL).sum(1).astype(np.int32)

        def body(c, i, mask, cnt, lin, q, tab):
            out = mask_sweep(mask, cnt, lin, q + c * 1e-9, tab, rpp)
            return c + jnp.sum(out)

        timed_scan(f"mask sweep frac={frac:.2f}", body,
                   (jnp.float32(0), jnp.asarray(mask), jnp.asarray(cnt),
                    jnp.asarray(lin), q, tab))


# ------------------------------------------------------------------ #
# 4) carry layouts
# ------------------------------------------------------------------ #

def bench_layout():
    pos = jnp.zeros((N, 2))
    thp = jnp.ones((N, 3))

    def outer_nd(pos, thp):
        def body(carry, i):
            pos, thp = carry
            pos = pos + thp[:, :2] * 0.5
            thp = thp * jnp.float32(0.999)
            return (pos, thp), None
        (pos, thp), _ = jax.lax.scan(body, (pos, thp), jnp.arange(64))
        return jnp.sum(pos) + jnp.sum(thp)

    c = jax.jit(outer_nd).lower(pos, thp).compile()
    c(pos, thp)
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(c(pos, thp)))
        ts.append(time.time() - t0)
    t = min(ts) / 64
    print(f"{'carry (N,2)+(N,3) x64':46s} {t*1e3:9.3f} ms/iter  "
          f"({t/N*1e9:6.1f} ns/lane)", flush=True)

    posT = jnp.zeros((2, N))
    thpT = jnp.ones((N,))

    def outer_pl(posT, thpT):
        def body(carry, i):
            posT, thpT = carry
            posT = posT + thpT[None, :] * 0.5
            thpT = thpT * jnp.float32(0.999)
            return (posT, thpT), None
        (posT, thpT), _ = jax.lax.scan(body, (posT, thpT), jnp.arange(64))
        return jnp.sum(posT) + jnp.sum(thpT)

    c = jax.jit(outer_pl).lower(posT, thpT).compile()
    c(posT, thpT)
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(c(posT, thpT)))
        ts.append(time.time() - t0)
    t = min(ts) / 64
    print(f"{'carry (2,N)+(N,) x64':46s} {t*1e3:9.3f} ms/iter  "
          f"({t/N*1e9:6.1f} ns/lane)", flush=True)


# ------------------------------------------------------------------ #
# 5) guiding network inference
# ------------------------------------------------------------------ #

def bench_network():
    from elaina_tpu.nn.network import apply_network, init_trainer, make_network
    from elaina_tpu.solver.distributions import (n_dim_output, vmm_from_raw,
                                                 vmm_pdf)

    spec = make_network(2, n_dim_output(2), {})
    tr = init_trainer(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
    d = jax.random.normal(jax.random.PRNGKey(2), (N, 2))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def body_net(c, i, params, x):
        raw = apply_network(spec, params, x + c * 1e-9)
        return c + jnp.sum(raw.astype(jnp.float32))

    timed_scan("apply_network (encode+MLP)", body_net,
               (jnp.float32(0), tr.ema_params, x))

    def body_full(c, i, params, x, d):
        raw = apply_network(spec, params, x + c * 1e-9)
        vmm = vmm_from_raw(raw, 2)
        p = vmm_pdf(vmm, d, 2)
        p2 = vmm_pdf(vmm, -d, 2)
        return c + jnp.sum(p) + jnp.sum(p2)

    timed_scan("network + vmm build + 2x vmm_pdf", body_full,
               (jnp.float32(0), tr.ema_params, x, d))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    a = ap.parse_args()
    print(f"backend={jax.default_backend()} n={N}", flush=True)
    benches = {"tent": bench_tent, "rng": bench_rng, "layout": bench_layout,
               "network": bench_network, "mask": bench_mask_kernel}
    for name, fn in benches.items():
        if a.only is None or a.only == name:
            fn()
