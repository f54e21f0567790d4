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
    # hierarchical-query aggregates (built only for large sets; None
    # otherwise — queries fall back to the dense/chunked sweeps)
    node_measure: jnp.ndarray | None = None   # (M,) subtree prim measure
    # silhouette-entity BVH with SNCH normal cones
    sil_bb_min: jnp.ndarray | None = None     # (Ms, D)
    sil_bb_max: jnp.ndarray | None = None
    sil_left: jnp.ndarray | None = None       # (Ms,) i32
    sil_right: jnp.ndarray | None = None
    sil_leaf: jnp.ndarray | None = None       # (Ms, LEAF_SIZE) i32, -1 pad
    sil_cone_axis: jnp.ndarray | None = None  # (Ms, D) unit
    sil_cone_cos: jnp.ndarray | None = None   # (Ms,) cos half-angle
    #                                           (<= -1.5: never prune)

    @property
    def dim(self) -> int:
        return int(self.indices.shape[1])

    @property
    def n_prims(self) -> int:
        return int(self.indices.shape[0])


def host_silhouette_entities(verts: np.ndarray, indices: np.ndarray) -> dict:
    """Host-side silhouette entity set (the builder make_geom_set uses).

    Scene construction must never pull arrays back OFF the device: the
    first device->host transfer of a fresh process stalls 40-600 s through
    the tunneled-TPU runtime (measured 2026-08-19; a 368 KB pull blocked
    258 s).  Callers that need the entity arrays host-side (the SilGrid
    build in problem.load_config) re-derive them here — the native builder
    is milliseconds — instead of np.asarray(gs.sil_*).
    """
    from . import native as native_mod
    if native_mod.available():
        return native_mod.silhouette_entities_native(verts, indices)
    return bvh_mod.silhouette_entities(verts, indices)


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
    else:
        tree = bvh_mod.build_bvh(verts, indices, LEAF_SIZE)
    sil = host_silhouette_entities(verts, indices)
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

    # hierarchical-query aggregates: only worth building (and paying host
    # time for) on sets past the dense/chunked thresholds
    from .queries import CHUNKED_DENSE_MAX
    hier: dict = {}
    if indices.shape[0] > CHUNKED_DENSE_MAX:
        hier["node_measure"] = jnp.asarray(bvh_mod.node_sums(tree, measure))
    if sil["p0"].shape[0] > CHUNKED_DENSE_MAX:
        lo = np.minimum(sil["p0"], sil["p1"])
        hi = np.maximum(sil["p0"], sil["p1"])
        stree = bvh_mod.build_bvh_boxes(lo, hi, LEAF_SIZE)
        axis, cone_cos = bvh_mod.node_normal_cones(
            stree, sil["n1"], sil["n2"], sil["always"])
        hier.update(
            sil_bb_min=jnp.asarray(stree.bb_min),
            sil_bb_max=jnp.asarray(stree.bb_max),
            sil_left=jnp.asarray(stree.left),
            sil_right=jnp.asarray(stree.right),
            sil_leaf=jnp.asarray(bvh_mod.pad_leaf_prims(stree, LEAF_SIZE)),
            sil_cone_axis=jnp.asarray(axis),
            sil_cone_cos=jnp.asarray(cone_cos),
        )

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
        **hier,
    )
    return gs, tree.depth
