"""GeomSet: one boundary set (Dirichlet or Neumann) as a JAX pytree.

Host-built from OBJ data (geometry/obj.py + geometry/bvh.py), then consumed
by the batched queries in geometry/queries.py.  This replaces the device
handle pair ``lbvh::scene<DIM>`` / ``lbvh::bvh_device`` of the reference
(problem.h:69,211) with flat arrays whose shapes are static under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import bvh as bvh_mod

LEAF_SIZE = 4


class GeomSet(NamedTuple):
    verts: jnp.ndarray          # (V, D)
    indices: jnp.ndarray        # (P, dim) int32
    prim_normal: jnp.ndarray    # (P, D)
    prim_measure: jnp.ndarray   # (P,) length (2D) / area (3D)
    # flattened BVH
    bb_min: jnp.ndarray         # (M, D)
    bb_max: jnp.ndarray         # (M, D)
    left: jnp.ndarray           # (M,) i32
    right: jnp.ndarray          # (M,) i32
    leaf_prims: jnp.ndarray     # (M, LEAF_SIZE) i32, -1 padded
    # silhouette entities
    sil_p0: jnp.ndarray         # (E, D)
    sil_p1: jnp.ndarray         # (E, D)
    sil_n1: jnp.ndarray         # (E, D)
    sil_n2: jnp.ndarray         # (E, D)
    sil_always: jnp.ndarray     # (E,) bool

    @property
    def dim(self) -> int:
        return int(self.indices.shape[1])

    @property
    def n_prims(self) -> int:
        return int(self.indices.shape[0])


def make_geom_set(verts: np.ndarray, indices: np.ndarray) -> tuple[GeomSet, int]:
    """Build a GeomSet (and return the BVH depth for stack sizing).

    Uses the native C++ builder (native/scene_build.cpp via ctypes) when the
    shared library is present; the NumPy path is the portable fallback and
    test oracle.
    """
    dim = indices.shape[1]
    from . import native as native_mod
    if native_mod.available():
        tree = native_mod.build_bvh_native(verts, indices, LEAF_SIZE)
        sil = native_mod.silhouette_entities_native(verts, indices)
    else:
        tree = bvh_mod.build_bvh(verts, indices, LEAF_SIZE)
        sil = bvh_mod.silhouette_entities(verts, indices)
    leaf_prims = bvh_mod.pad_leaf_prims(tree, LEAF_SIZE)

    pv = verts[indices]  # (P, dim, D)
    if dim == 2:
        e = pv[:, 1] - pv[:, 0]
        n = np.stack([-e[:, 1], e[:, 0]], axis=-1)
        measure = np.linalg.norm(e, axis=-1)
    else:
        n = np.cross(pv[:, 1] - pv[:, 0], pv[:, 2] - pv[:, 0])
        measure = 0.5 * np.linalg.norm(n, axis=-1)
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)

    gs = GeomSet(
        verts=jnp.asarray(verts),
        indices=jnp.asarray(indices),
        prim_normal=jnp.asarray(n.astype(np.float32)),
        prim_measure=jnp.asarray(measure.astype(np.float32)),
        bb_min=jnp.asarray(tree.bb_min),
        bb_max=jnp.asarray(tree.bb_max),
        left=jnp.asarray(tree.left),
        right=jnp.asarray(tree.right),
        leaf_prims=jnp.asarray(leaf_prims),
        sil_p0=jnp.asarray(sil["p0"]),
        sil_p1=jnp.asarray(sil["p1"]),
        sil_n1=jnp.asarray(sil["n1"]),
        sil_n2=jnp.asarray(sil["n2"]),
        sil_always=jnp.asarray(sil["always"]),
    )
    return gs, tree.depth
