#!/usr/bin/env python
"""Probe Mosaic legality + cost of the primitives the fused resolve needs.

A) scalar VMEM read with dynamic indices inside a kernel
B) (8,128) DMA slice from a 2D (X,128) HBM table at dynamic 8-aligned row
C) (1,8,128) tile DMA from a 3D (X,8,128) HBM table at dynamic lead index
D) XLA gather cost: 65k lanes from 4MB vs 1GB tables
E) int32 VMEM one-hot extract cost (vector fallback for A)
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


def probe(name, fn):
    try:
        out = fn()
        out = np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"[OK]   {name}: {out.ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:180]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)
        return False


# ------------------------------------------------------------------ #
# A) dynamic scalar VMEM read
# ------------------------------------------------------------------ #

def probe_scalar_vmem():
    def kern(i_ref, x_ref, o_ref):
        i = i_ref[0]
        j = i_ref[1]
        v = x_ref[i, j]          # dynamic scalar read from VMEM
        o_ref[0, 0] = v

    def run():
        x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
        idx = jnp.asarray([3, 77], jnp.int32)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                                       memory_space=pltpu.SMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(idx, x)

    return probe("A scalar VMEM read [i,j] dynamic", run)


# ------------------------------------------------------------------ #
# B) (8,128) DMA slice from 2D (X,128) at dynamic 8-aligned row
# ------------------------------------------------------------------ #

def probe_dma_2d():
    def kern(r_ref, tab_ref, o_ref, buf, sem):
        base = (r_ref[0] // 8) * 8
        pltpu.make_async_copy(tab_ref.at[pl.ds(base, 8)], buf, sem).start()
        pltpu.make_async_copy(tab_ref.at[pl.ds(base, 8)], buf, sem).wait()
        o_ref[...] = buf[...]

    def run():
        tab = jnp.arange(1024 * 128, dtype=jnp.float32).reshape(1024, 128)
        r = jnp.asarray([517], jnp.int32)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(r, tab)

    return probe("B (8,128) DMA from 2D (X,128) dyn row", run)


# ------------------------------------------------------------------ #
# C) (1,8,128) tile DMA from 3D (X,8,128) dynamic lead index (known OK
#    from round 1, sanity check with int32)
# ------------------------------------------------------------------ #

def probe_dma_3d():
    def kern(r_ref, tab_ref, o_ref, buf, sem):
        pltpu.make_async_copy(tab_ref.at[r_ref[0]], buf, sem).start()
        pltpu.make_async_copy(tab_ref.at[r_ref[0]], buf, sem).wait()
        o_ref[...] = buf[...]

    def run():
        tab = jnp.arange(64 * 8 * 128, dtype=jnp.int32).reshape(64, 8, 128)
        r = jnp.asarray([13], jnp.int32)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                                pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )(r, tab)

    return probe("C (8,128) int32 tile DMA from 3D dyn lead", run)


# ------------------------------------------------------------------ #
# D) XLA gather: small vs large table
# ------------------------------------------------------------------ #

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


def probe_gather():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, 10**6)
    for sz, lbl in ((10**6, "4MB"), (268 * 10**6, "1GB")):
        tab = jnp.ones((sz,), jnp.float32)
        ii = jnp.minimum(idx, sz - 1)

        def body(c, i, tab, ii):
            return c + jnp.sum(tab[(ii + i) % sz])

        timed_scan(f"D XLA gather 65k from {lbl}", body,
                   (jnp.float32(0), tab, ii))
    # (2P, 8) color-table style gather: 122k x 8 rows, take full rows
    tab = jnp.ones((122 * 1024, 8), jnp.float32)
    ii = jnp.minimum(idx, 122 * 1024 - 1)

    def body(c, i, tab, ii):
        return c + jnp.sum(tab[(ii + i) % (122 * 1024)])

    timed_scan("D XLA row gather 65k x (8,) from 3.9MB", body,
               (jnp.float32(0), tab, ii))


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    a = probe_scalar_vmem()
    b = probe_dma_2d()
    c = probe_dma_3d()
    probe_gather()
    print(f"scalar_vmem={a} dma2d={b} dma3d={c}", flush=True)
