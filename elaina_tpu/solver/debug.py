"""Debug introspection: per-depth walk trace for a single evaluation point.

TPU-native replacement for the reference's ``debugPixel`` printf gating
(integrator/common.h:40-49): instead of interleaving prints in device code,
trace one walk's full state history on a 1-lane batch and return it as a
list of dicts — scriptable and diff-able.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import Scene
from .wost import init_walk_state, wost_depth_step


def trace_walk(scene: Scene, point, key=None, *, eps: float = 1e-3,
               max_depth: int = 16, d_stack: int = 48, n_stack: int = 48):
    """Returns one entry per depth with the walk state and contribution."""
    if key is None:
        key = jax.random.PRNGKey(0)
    pts = jnp.asarray(point, jnp.float32)[None, :]
    state = init_walk_state(pts, jnp.ones((1,), bool))
    out = []
    for depth in range(max_depth):
        k = jax.random.fold_in(key, depth)
        prev_pos = np.asarray(state.pos[0])
        state, contrib = wost_depth_step(scene, state, k, eps, d_stack, n_stack)
        entry = {
            "depth": depth,
            "pos": prev_pos.tolist(),
            "next_pos": np.asarray(state.pos[0]).tolist(),
            "contribution": np.asarray(contrib[0]).tolist(),
            "thp": np.asarray(state.thp[0]).tolist(),
            "active": bool(state.active[0]),
            "on_neumann": bool(state.on_neumann[0]),
            "neumann_normal": np.asarray(state.n_normal[0]).tolist(),
        }
        out.append(entry)
        if not entry["active"]:
            break
    return out
