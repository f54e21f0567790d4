#!/usr/bin/env python
"""Guided-path TPU costs: network inference, guided step, full sample."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _build_ladybug_problem
from elaina_tpu.nn.network import apply_network, init_params, make_network
from elaina_tpu.solver import guided as G


def timed(label, compiled, *args, reps=2):
    out = compiled(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = compiled(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    print(f"{label:38s} {min(ts)*1e3:9.1f} ms", flush=True)


def main():
    res = 256
    problem = _build_ladybug_problem(res, "grid")
    if problem.scene.d_grid is not None:
        import dataclasses

        from elaina_tpu.geometry.grid import attach_fine
        problem.scene = dataclasses.replace(
            problem.scene, d_grid=attach_fine(problem.scene.d_grid, 1.0))
    scene = problem.scene
    n = res * res
    pts = problem.probe.points(jnp.arange(n), (res, res))
    mask = jnp.ones((n,), bool)
    key = jax.random.PRNGKey(0)

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
    c = jax.jit(lambda p, xx: jnp.sum(apply_network(spec, p, xx))).lower(
        params, x).compile()
    timed("apply_network (enc+MLP) x1", c, params, x)

    from elaina_tpu.nn.encoding import grid_encode
    c = jax.jit(lambda t, xx: jnp.sum(
        grid_encode(spec.encoding, t, xx))).lower(params["table"], x).compile()
    timed("grid_encode only x1", c, params["table"], x)

    # one guided depth step
    records = G.init_records(n, 2)
    state = G.init_walk_state(pts, mask)

    def step1(sc, p, st, rec, k):
        st, rec, contrib = G.guided_depth_step(
            sc, spec, p, st, rec, k, jnp.int32(0),
            jnp.bool_(True), jnp.bool_(True), jnp.float32(0.5),
            jnp.int32(10), eps=1.0, d_stack=problem.d_stack,
            n_stack=problem.n_stack)
        return jnp.sum(contrib)

    c = jax.jit(step1).lower(scene, params, state, records, key).compile()
    timed("guided_depth_step x1", c, scene, params, state, records, key)

    def sample(sc, p, k):
        total, recs, lives = G.run_one_guided_sample(
            sc, spec, p, pts, mask, k, jnp.bool_(True), jnp.bool_(True),
            jnp.float32(0.5), jnp.int32(10), eps=1.0, max_depth=64,
            d_stack=problem.d_stack, n_stack=problem.n_stack)
        return jnp.sum(total) + lives

    c = jax.jit(sample).lower(scene, params, key).compile()
    timed("guided sample depth=64", c, scene, params, key)


if __name__ == "__main__":
    main()
