#!/usr/bin/env python
"""Measure scattered-access primitives on TPU: XLA gather formulations vs
a Pallas per-lane-DMA gather.  Decides the mega-kernel design."""
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


def timed_scan(label, body_fn, init_args, length=8, reps=3):
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
    print(f"{label:46s} {min(ts)/length*1e3:9.2f} ms/iter", flush=True)
    return min(ts) / length


def main():
    n = 65536
    T = 1 << 20
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal(T), jnp.float32)
    tab2d = tab.reshape(T // 128, 128)
    tab8 = tab.reshape(T // 8, 8)
    lin = jnp.asarray(rng.integers(0, T, n), jnp.int32)
    lin_sorted = jnp.sort(lin)

    def rot(l, i):
        return (l + i * 977) % T

    # 1) plain 1-D gather
    timed_scan("g1 plain t[lin]",
               lambda c, i, t, l: c + jnp.sum(t[rot(l, i)]),
               (jnp.float32(0), tab, lin))
    timed_scan("g1s plain t[lin] sorted",
               lambda c, i, t, l: c + jnp.sum(t[rot(l, 0) * 0 + l]),
               (jnp.float32(0), tab, lin_sorted))

    # 2) row gather (T/128,128) + take_along_axis over lanes
    def g2(c, i, t2, l):
        li = rot(l, i)
        rows = t2[li // 128]                       # (n, 128)
        v = jnp.take_along_axis(rows, (li % 128)[:, None], axis=1)[:, 0]
        return c + jnp.sum(v)
    timed_scan("g2 row gather + take_along", g2, (jnp.float32(0), tab2d, lin))

    # 3) row gather + one-hot reduce
    def g3(c, i, t2, l):
        li = rot(l, i)
        rows = t2[li // 128]
        oh = (li % 128)[:, None] == jnp.arange(128)[None]
        return c + jnp.sum(jnp.where(oh, rows, 0.0))
    timed_scan("g3 row gather + onehot", g3, (jnp.float32(0), tab2d, lin))

    # 3b) (T/8, 8) sublane-row gather + onehot
    def g3b(c, i, t8, l):
        li = rot(l, i)
        rows = t8[li // 8]                          # (n, 8)
        oh = (li % 8)[:, None] == jnp.arange(8)[None]
        return c + jnp.sum(jnp.where(oh, rows, 0.0))
    timed_scan("g3b (T/8,8) row gather + onehot", g3b,
               (jnp.float32(0), tab8, lin))

    BL = 256

    # 5) pallas per-lane 512B row DMA ((T/128,128) rows)
    def dma_row_kernel(lin_ref, tab_ref, out_ref, buf, sem):
        def issue(l, _):
            pltpu.make_async_copy(tab_ref.at[lin_ref[l]], buf.at[l],
                                  sem).start()
            return 0
        jax.lax.fori_loop(0, BL, issue, 0, unroll=1)

        def wait(l, _):
            pltpu.make_async_copy(tab_ref.at[lin_ref[l]], buf.at[l],
                                  sem).wait()
            return 0
        jax.lax.fori_loop(0, BL, wait, 0, unroll=1)
        out_ref[:] = buf[:]

    def dma_row_kernel2(lin_ref, tab_ref, out_ref, buf, sem):
        b = pl.program_id(0)
        def issue(l, _):
            pltpu.make_async_copy(tab_ref.at[lin_ref[b * BL + l]], buf.at[l],
                                  sem).start()
            return 0
        jax.lax.fori_loop(0, BL, issue, 0, unroll=1)

        def wait(l, _):
            pltpu.make_async_copy(tab_ref.at[lin_ref[b * BL + l]], buf.at[l],
                                  sem).wait()
            return 0
        jax.lax.fori_loop(0, BL, wait, 0, unroll=1)
        out_ref[:] = buf[:]

    @jax.jit
    def pallas_row_gather(t2, l):
        rows = pl.pallas_call(
            dma_row_kernel2,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // BL,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((BL, 128), lambda i, lref: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((BL, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        )(l // 128, t2)
        oh = (l % 128)[:, None] == jnp.arange(128)[None]
        return jnp.sum(jnp.where(oh, rows, 0.0), axis=1)

    timed_scan("g5 pallas row DMA + onehot",
               lambda c, i, t2, l: c + jnp.sum(pallas_row_gather(t2, rot(l, i))),
               (jnp.float32(0), tab2d, lin))


if __name__ == "__main__":
    main()
