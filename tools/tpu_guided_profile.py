#!/usr/bin/env python
"""Guided-path TPU costs, scan-amortized (dispatch latency through the
axon tunnel is ~25 ms — any single-dispatch timing is pure noise, so every
piece runs under a LEN-iteration scan like tools/tpu_sil_probe.py)."""
import argparse
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

sys.path.insert(0, "/root/repo")
from bench import _build_ladybug_problem
from elaina_tpu.nn.network import apply_network, init_params, make_network
from elaina_tpu.solver import guided as G

LEN = 32


def timed(label, fn, *args, reps=3, n=None):
    """fn(carry, *rest) -> array; timed under a LEN-iteration scan."""
    def outer(q, *rest):
        def body(carry, i):
            out = fn(carry, *rest)
            return carry + 1e-7 * jnp.mean(out), None
        c, _ = jax.lax.scan(body, q, jnp.arange(LEN))
        return c

    c = jax.jit(outer).lower(*args).compile()
    out = c(*args)
    np.asarray(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = c(*args)
        np.asarray(out)
        ts.append(time.time() - t0)
    t = min(ts) / LEN
    n = n or args[0].shape[0]
    print(f"{label:40s} {t*1e3:9.3f} ms/iter  ({t/n*1e9:7.1f} ns/lane)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    a = ap.parse_args()
    res = a.res
    problem = _build_ladybug_problem(res, "grid")
    if problem.scene.d_grid is not None and (
            problem.scene.d_grid.fine is None
            or problem.scene.d_grid.fine.eps != 1.0):
        import dataclasses

        from elaina_tpu.geometry.grid import attach_fine
        problem.scene = dataclasses.replace(
            problem.scene, d_grid=attach_fine(problem.scene.d_grid, 1.0))
    scene = problem.scene
    n = res * res
    pts = problem.probe.points(jnp.arange(n), (res, res))
    mask = jnp.ones((n,), bool)
    key = jax.random.PRNGKey(0)
    print(f"res={res} n={n} devices={jax.devices()}", flush=True)

    conf = {
        "encoding": {"otype": "DenseGrid", "base_resolution": 8,
                     "n_levels": 8, "n_features_per_level": 4,
                     "per_level_scale": 1.405},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 3, "activation": "ReLU"},
    }
    from elaina_tpu.solver.guided import n_dim_output
    spec = make_network(2, n_dim_output(2), conf)
    params = init_params(key, spec)

    x = jax.random.uniform(key, (n, 2))
    timed("apply_network (enc+MLP)",
          lambda xx, p: apply_network(spec, p, xx), x, params)

    from elaina_tpu.nn.encoding import grid_encode
    timed("grid_encode only",
          lambda xx, t: grid_encode(spec.encoding, t, xx), x,
          params["table"])

    # MLP only, on a fixed encoding output
    h0 = grid_encode(spec.encoding, params["table"], x)

    def mlp_only(h, p):
        n_layers = spec.n_hidden + 2
        for i in range(n_layers):
            h = jnp.dot(h.astype(jnp.bfloat16), p[f"w{i}"].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + p[f"b{i}"]
            if i < n_layers - 1:
                h = jax.nn.relu(h)
        return h

    timed("MLP only", mlp_only, h0, params)

    # vmm pieces on raw network outputs
    from elaina_tpu.solver.distributions import (vmm_from_raw, vmm_pdf,
                                                 vmm_sample)
    raw = jax.random.normal(key, (n, G.n_dim_output(2)))

    timed("vmm_from_raw + vmm_sample",
          lambda r, k: vmm_sample(k, vmm_from_raw(r, 2), 2), raw, key)

    dirs = jax.random.normal(key, (n, 2))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    timed("vmm_from_raw + vmm_pdf",
          lambda r, d: vmm_pdf(vmm_from_raw(r, 2), d, 2), raw, dirs)

    # uniform depth step at the same lane count
    from elaina_tpu.solver.wost import init_walk_state as init_u
    from elaina_tpu.solver.wost import wost_depth_step

    def ustep(p, sc, k):
        st = init_u(p, jnp.ones((n,), bool))
        st, contrib = wost_depth_step(sc, st, k, 1.0, problem.d_stack,
                                      problem.n_stack)
        return jnp.sum(contrib, -1) + st.thp

    timed("uniform wost_depth_step", ustep, pts, scene, key)

    # guided TRAINING-phase step (records on)
    records = G.init_records(n, 2)
    state = G.init_walk_state(pts, mask)

    def step_train(p, sc, prm, k):
        st = state._replace(pos=p)
        st, rec, contrib = G.guided_depth_step(
            sc, spec, prm, st, records, k, jnp.int32(0),
            jnp.bool_(True), jnp.bool_(True), jnp.float32(0.5),
            jnp.int32(10), eps=1.0, d_stack=problem.d_stack,
            n_stack=problem.n_stack)
        return jnp.sum(contrib, -1) + st.thp

    timed("train-phase step (records on)", step_train, pts, scene, params,
          key)

    # the production GUIDE-phase step: no records, training off
    def step_guide(p, sc, prm, k):
        st = state._replace(pos=p)
        st, _, contrib = G.guided_depth_step(
            sc, spec, prm, st, None, k, jnp.int32(0),
            jnp.bool_(True), jnp.bool_(False), jnp.float32(0.5),
            jnp.int32(10), eps=1.0, d_stack=problem.d_stack,
            n_stack=problem.n_stack)
        return jnp.sum(contrib, -1) + st.thp

    timed("guide-phase step (no records)", step_guide, pts, scene, params,
          key)


if __name__ == "__main__":
    main()
