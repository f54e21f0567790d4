#!/usr/bin/env python
"""Marginal depth-step costs on TPU: where does the late-step floor go?"""
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
from elaina_tpu.solver.wost import (init_walk_state, run_one_sample,
                                    wost_depth_step)


def sync_time(compiled, *args, reps=2):
    out = compiled(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = compiled(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    return min(ts)


def main():
    res = 256
    problem = _build_ladybug_problem(res, "grid")
    scene = problem.scene
    n = res * res
    pts = problem.probe.points(jnp.arange(n), (res, res))
    key = jax.random.PRNGKey(0)

    # dead state: fixed overhead of one masked step
    def step_dead(sc, p, k):
        st = init_walk_state(p, jnp.zeros((n,), bool))
        st, contrib = wost_depth_step(sc, st, k, 1.0, problem.d_stack,
                                      problem.n_stack)
        return jnp.sum(contrib) + jnp.sum(st.pos)

    c = jax.jit(step_dead).lower(scene, pts, key).compile()
    t = sync_time(c, scene, pts, key)
    print(f"step (all dead)            {t*1e3:8.1f} ms", flush=True)

    # scan of 8 dead steps: amortized fixed overhead inside scan
    def scan_dead(sc, p, k):
        st = init_walk_state(p, jnp.zeros((n,), bool))

        def body(carry, kk):
            st, acc = carry
            st, cb = wost_depth_step(sc, st, kk, 1.0, problem.d_stack,
                                     problem.n_stack)
            return (st, acc + jnp.sum(cb)), None

        (st, acc), _ = jax.lax.scan(body, (st, jnp.float32(0)),
                                    jax.random.split(k, 8))
        return acc + jnp.sum(st.pos)

    c = jax.jit(scan_dead).lower(scene, pts, key).compile()
    t = sync_time(c, scene, pts, key)
    print(f"scan 8 steps (all dead)    {t*1e3:8.1f} ms -> {t/8*1e3:.2f} ms/step",
          flush=True)

    # marginal real-walk cost per depth range
    prev_t, prev_d = 0.0, 0
    for depth in (1, 4, 16, 64):
        def fulln(sc, p, k, _d=depth):
            total, steps = run_one_sample(sc, p, jnp.ones((n,), bool), k,
                                          eps=1.0, max_depth=_d,
                                          d_stack=problem.d_stack,
                                          n_stack=problem.n_stack)
            return jnp.sum(total) + steps

        c = jax.jit(fulln).lower(scene, pts, key).compile()
        t = sync_time(c, scene, pts, key)
        marg = (t - prev_t) / max(depth - prev_d, 1) * 1e3
        print(f"run_one_sample depth={depth:3d}  {t*1e3:8.1f} ms"
              f"  (marginal {marg:.2f} ms/step)", flush=True)
        prev_t, prev_d = t, depth


if __name__ == "__main__":
    main()
