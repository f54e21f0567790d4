#!/usr/bin/env python
"""Micro-variants of the per-lane-DMA band sweep: find the scalar-loop
floor.  Measures all-skip and all-fetch for each variant on a synthetic
coords table shaped like ladybug's (rpp=2, 8 rows/cell)."""
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
R = 200_000
RPP = 2
NROWS = 8


def timed(label, fn, *args, reps=3):
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = c(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    print(f"{label:52s} {min(ts)/8*1e3:8.2f} ms/iter", flush=True)
    return min(ts)


def make_variant(BL, LC, unroll_issue, unroll_wait):
    def kernel(lin_ref, q_ref, tab_ref, d2_ref, buf, sems):
        b = pl.program_id(0)

        def issue(l, c):
            cell = lin_ref[b * BL + l]

            @pl.when(cell >= 0)
            def _():
                pltpu.make_async_copy(tab_ref.at[cell], buf.at[l],
                                      sems).start()
            return c
        jax.lax.fori_loop(0, BL, issue, 0,
                          unroll=BL if unroll_issue else 1)

        def wait(l, c):
            cell = lin_ref[b * BL + l]

            @pl.when(cell >= 0)
            def _():
                pltpu.make_async_copy(tab_ref.at[cell], buf.at[l],
                                      sems).wait()
            return c
        jax.lax.fori_loop(0, BL, wait, 0,
                          unroll=BL if unroll_wait else 1)

        qx = q_ref[:, 0:1]
        qy = q_ref[:, 1:2]
        best = jnp.full((BL, 128), jnp.float32(jnp.inf))
        for r in range(RPP):
            ax = buf[:, 0 * RPP + r, :]
            ay = buf[:, 1 * RPP + r, :]
            bx = buf[:, 2 * RPP + r, :]
            by = buf[:, 3 * RPP + r, :]
            ex = bx - ax
            ey = by - ay
            wx = qx - ax
            wy = qy - ay
            den = jnp.maximum(ex * ex + ey * ey, 1e-30)
            t = jnp.clip((wx * ex + wy * ey) / den, 0.0, 1.0)
            dx = wx - t * ex
            dy = wy - t * ey
            best = jnp.minimum(best, dx * dx + dy * dy)
        d2_ref[pl.ds(b, 1), :] = jnp.min(best, axis=1)[None, :]

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(LC // BL,),
            in_specs=[
                pl.BlockSpec((BL, 2), lambda i, lr: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((LC // BL, BL), lambda i, lr: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BL, NROWS, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((LC // BL, BL), jnp.float32),
    )

    def one(lin, q, tab):
        if LC == N:
            return jnp.sum(call(lin, q, tab))
        lin_r = lin.reshape(-1, LC)
        q_r = q.reshape(-1, LC, 2)

        def body(c, xs):
            l_c, q_c = xs
            return c + jnp.sum(call(l_c, q_c, tab)), None
        out, _ = jax.lax.scan(body, jnp.float32(0), (lin_r, q_r))
        return out

    @jax.jit
    def run(lin, q, tab):
        def body(c, i):
            return c + one(lin, q + c * 1e-12, tab), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(8))
        return out

    return run


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((R, NROWS, 128)), jnp.float32)
    q = jnp.asarray(rng.uniform(-1, 1, (N, 2)), jnp.float32)
    lin_all = jnp.asarray(rng.integers(0, R, N), jnp.int32)
    lin_skip = jnp.full((N,), -1, jnp.int32)
    frac = rng.random(N) < 0.3
    lin_30 = jnp.where(jnp.asarray(frac), lin_all, -1)

    for BL, LC, ui, uw, name in (
        (256, 8192, True, False, "V0 prod (BL256 LC8k, unroll issue)"),
        (256, N, True, False, "V1 single call (LC=N)"),
        (256, N, True, True, "V2 V1 + unroll wait"),
        (512, N, True, True, "V3 BL512 full unroll"),
        (1024, N, True, True, "V4 BL1024 full unroll"),
        (256, N, False, False, "V5 V1 rolled both"),
    ):
        try:
            run = make_variant(BL, LC, ui, uw)
            for label, lin in (("skip", lin_skip), ("fetch", lin_all),
                               ("30%", lin_30)):
                timed(f"{name} [{label}]", run, lin, q, tab)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
