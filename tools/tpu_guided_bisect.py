#!/usr/bin/env python
"""Scan-amortized guided-path costs at 65k lanes (subtract the empty-scan
row: ~25 ms tunnel dispatch / 64 iters)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np

N = 65536
LEN = 64


def timed(label, body_fn, init_args, reps=3, length=LEN):
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


def main():
    from bench import _build_ladybug_problem
    from elaina_tpu.geometry.grid import attach_fine
    from elaina_tpu.nn.network import apply_network, init_trainer, make_network
    from elaina_tpu.solver import guided as G
    from elaina_tpu.solver.distributions import (n_dim_output, vmm_from_raw,
                                                 vmm_pdf, vmm_sample,
                                                 vmm_selection_prob)

    t0 = time.time()
    problem = _build_ladybug_problem(256, "grid")
    import dataclasses
    problem.scene = dataclasses.replace(
        problem.scene, d_grid=attach_fine(problem.scene.d_grid, 1.0))
    scene = problem.scene
    print(f"problem built in {time.time()-t0:.1f}s", flush=True)

    pts = problem.probe.points(jnp.arange(N), (256, 256))
    key = jax.random.PRNGKey(0)
    conf = {"encoding": {"otype": "DenseGrid", "base_resolution": 8,
                         "n_levels": 8, "n_features_per_level": 4,
                         "per_level_scale": 1.405},
            "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                        "n_hidden_layers": 3, "activation": "ReLU"}}
    spec = make_network(2, n_dim_output(2), conf)
    tr = init_trainer(key, spec)
    params = tr.ema_params
    x = jax.random.uniform(key, (N, 2))
    d = jax.random.normal(key, (N, 2))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    timed("empty scan (dispatch floor)",
          lambda c, i: c + 1.0, (jnp.float32(0),))

    timed("apply_network (enc+MLP)",
          lambda c, i, p, xx: c + jnp.sum(
              apply_network(spec, p, xx + c * 1e-9).astype(jnp.float32)),
          (jnp.float32(0), params, x))

    def body_vmm(c, i, p, xx, dd):
        raw = apply_network(spec, p, xx + c * 1e-9)
        vmm = vmm_from_raw(raw, 2)
        sp = vmm_selection_prob(raw, 2)
        smp = vmm_sample(jax.random.fold_in(key, i), vmm, 2)
        pdf1 = vmm_pdf(vmm, dd, 2)
        pdf2 = vmm_pdf(vmm, -dd, 2)
        return c + jnp.sum(pdf1 + pdf2 + sp) + jnp.sum(smp)

    timed("network + vmm build/sample + 2x pdf", body_vmm,
          (jnp.float32(0), params, x, d))

    # guided depth step, training config (records on)
    rec = G.init_records(N, 2)
    st = G.init_walk_state(pts, jnp.ones((N,), bool))

    def body_step(c, i, sc, p, s0, r0):
        s1, r1, contrib = G.guided_depth_step(
            sc, spec, p, s0._replace(pos=s0.pos + c * 1e-9), r0,
            jax.random.fold_in(key, i), jnp.int32(0), jnp.bool_(True),
            jnp.bool_(True), jnp.float32(0.5), jnp.int32(10), eps=1.0,
            d_stack=48, n_stack=48)
        return c + jnp.sum(contrib)

    timed("guided_depth_step (train, records)", body_step,
          (jnp.float32(0), scene, params, st, rec))

    def body_step_g(c, i, sc, p, s0):
        s1, r1, contrib = G.guided_depth_step(
            sc, spec, p, s0._replace(pos=s0.pos + c * 1e-9), None,
            jax.random.fold_in(key, i), jnp.int32(0), jnp.bool_(True),
            jnp.bool_(False), jnp.float32(0.5), jnp.int32(10), eps=1.0,
            d_stack=48, n_stack=48)
        return c + jnp.sum(contrib)

    timed("guided_depth_step (guide, no records)", body_step_g,
          (jnp.float32(0), scene, params, st))

    # training pass on a full record buffer
    from elaina_tpu.nn.network import AdamConfig
    adam = AdamConfig.from_json({
        "otype": "Ema", "decay": 0.95,
        "nested": {"otype": "Adam", "learning_rate": 8e-3, "beta1": 0.9,
                   "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6}})
    rec_full = G.WalkRecords(
        cur=jnp.full((N,), 3, jnp.int32),
        pos=jax.random.uniform(key, (G.MAX_TRAIN_DEPTH, N, 2)) * 500.0,
        dir=jnp.tile(d[None], (G.MAX_TRAIN_DEPTH, 1, 1)),
        dir_pdf=jnp.full((G.MAX_TRAIN_DEPTH, N), 0.2),
        thp=jnp.ones((G.MAX_TRAIN_DEPTH, N)),
        sol=jnp.ones((G.MAX_TRAIN_DEPTH, N, 3)) * 0.5,
        on_neumann=jnp.zeros((G.MAX_TRAIN_DEPTH, N), bool),
        normal=jnp.zeros((G.MAX_TRAIN_DEPTH, N, 2)))

    def body_train(c, i, trr, sc, rr):
        trr2, metric = G.train_on_records(
            trr, spec, adam, sc, rr, batch_size=min(65536 * 8, 4 * N),
            n_batches=1)
        return c + metric, trr2

    def outer_train(cc, trr, sc, rr):
        def body(carry, i):
            c, t2 = carry
            c2, t3 = body_train(c, i, t2, sc, rr)
            return (c2, t3), None
        (c, _), _ = jax.lax.scan(body, (cc, trr), jnp.arange(8))
        return c

    c = jax.jit(outer_train).lower(jnp.float32(0), tr, scene,
                                   rec_full).compile()
    out = c(jnp.float32(0), tr, scene, rec_full)
    float(np.asarray(out))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(c(jnp.float32(0), tr, scene, rec_full)))
        ts.append(time.time() - t0)
    print(f"{'train_on_records (1 batch of 262k)':46s} "
          f"{min(ts)/8*1e3:9.3f} ms/iter", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    main()
