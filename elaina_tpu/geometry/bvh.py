"""Host-side BVH construction and silhouette-entity extraction (NumPy).

TPU-native replacement for the snch-lbvh GPU builder (SURVEY.md §2.1,
problem.cu:29-54 ``compute_silhouettes()`` + ``build_bvh()``).  The tree is
built once at scene-load time on the host and flattened into plain arrays
that the batched JAX traversal kernels (geometry/queries.py) and later
Pallas kernels consume.  A longest-axis median split over primitive
centroids gives a balanced tree (depth ~ log2(P)), which bounds the
traversal stack a TPU lane needs.

Flattened layout (M = number of nodes):
  bb_min, bb_max : (M, D) f32   node bounds
  left, right    : (M,) i32     child node ids (internal nodes)
  start, count   : (M,) i32     sorted-prim range (leaf nodes; count==0 => internal)
  prim_order     : (P,) i32     permutation into the original primitive list

Silhouette entities implement the SNCH "closest silhouette point" query
data: in 2D every boundary-curve vertex with its two adjacent segment
normals, in 3D every mesh edge with its two adjacent triangle normals.  An
entity is a *silhouette* for query point q iff the adjacent normals straddle
the view vector (dot(n1, v) * dot(n2, v) <= 0) or the entity borders a hole
(single adjacency) — the standard WoSt visibility-silhouette definition.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class BVHArrays:
    bb_min: np.ndarray
    bb_max: np.ndarray
    left: np.ndarray
    right: np.ndarray
    start: np.ndarray
    count: np.ndarray
    prim_order: np.ndarray
    depth: int


def build_bvh(verts: np.ndarray, indices: np.ndarray, leaf_size: int = 4) -> BVHArrays:
    P, dim = indices.shape[0], verts.shape[1]
    prim_verts = verts[indices]                       # (P, dim, D)
    prim_min = prim_verts.min(axis=1)
    prim_max = prim_verts.max(axis=1)
    centroids = 0.5 * (prim_min + prim_max)

    order = np.arange(P)
    bb_min, bb_max, left, right, start, count = [], [], [], [], [], []

    # (lo, hi, parent, is_left) work stack; node ids assigned in pop order.
    stack = [(0, P, -1, False)]
    max_depth = 0
    depth_stack = [0]
    while stack:
        lo, hi, parent, is_left = stack.pop()
        d = depth_stack.pop()
        max_depth = max(max_depth, d)
        nid = len(bb_min)
        if parent >= 0:
            if is_left:
                left[parent] = nid
            else:
                right[parent] = nid
        sel = order[lo:hi]
        bb_min.append(prim_min[sel].min(axis=0))
        bb_max.append(prim_max[sel].max(axis=0))
        if hi - lo <= leaf_size:
            left.append(-1)
            right.append(-1)
            start.append(lo)
            count.append(hi - lo)
            continue
        left.append(-1)
        right.append(-1)
        start.append(0)
        count.append(0)
        c = centroids[sel]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        mid = (hi - lo) // 2
        part = np.argpartition(c[:, axis], mid)
        order[lo:hi] = sel[part]
        # push right first so left pops first (cache-friendlier ordering)
        stack.append((lo + mid, hi, nid, False))
        depth_stack.append(d + 1)
        stack.append((lo, lo + mid, nid, True))
        depth_stack.append(d + 1)

    return BVHArrays(
        bb_min=np.asarray(bb_min, np.float32),
        bb_max=np.asarray(bb_max, np.float32),
        left=np.asarray(left, np.int32),
        right=np.asarray(right, np.int32),
        start=np.asarray(start, np.int32),
        count=np.asarray(count, np.int32),
        prim_order=order.astype(np.int32),
        depth=max_depth,
    )


def build_bvh_boxes(box_min: np.ndarray, box_max: np.ndarray,
                    leaf_size: int = 4) -> BVHArrays:
    """Median-split BVH over arbitrary element boxes (e.g. silhouette
    entities) — same flattened layout as build_bvh."""
    P = box_min.shape[0]
    centroids = 0.5 * (box_min + box_max)

    order = np.arange(P)
    bb_min, bb_max, left, right, start, count = [], [], [], [], [], []
    stack = [(0, P, -1, False)]
    max_depth = 0
    depth_stack = [0]
    while stack:
        lo, hi, parent, is_left = stack.pop()
        d = depth_stack.pop()
        max_depth = max(max_depth, d)
        nid = len(bb_min)
        if parent >= 0:
            if is_left:
                left[parent] = nid
            else:
                right[parent] = nid
        sel = order[lo:hi]
        bb_min.append(box_min[sel].min(axis=0))
        bb_max.append(box_max[sel].max(axis=0))
        if hi - lo <= leaf_size:
            left.append(-1)
            right.append(-1)
            start.append(lo)
            count.append(hi - lo)
            continue
        left.append(-1)
        right.append(-1)
        start.append(0)
        count.append(0)
        c = centroids[sel]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        mid = (hi - lo) // 2
        part = np.argpartition(c[:, axis], mid)
        order[lo:hi] = sel[part]
        stack.append((lo + mid, hi, nid, False))
        depth_stack.append(d + 1)
        stack.append((lo, lo + mid, nid, True))
        depth_stack.append(d + 1)

    return BVHArrays(
        bb_min=np.asarray(bb_min, np.float32),
        bb_max=np.asarray(bb_max, np.float32),
        left=np.asarray(left, np.int32),
        right=np.asarray(right, np.int32),
        start=np.asarray(start, np.int32),
        count=np.asarray(count, np.int32),
        prim_order=order.astype(np.int32),
        depth=max_depth,
    )


def node_sums(bvh: BVHArrays, values: np.ndarray) -> np.ndarray:
    """Per-node subtree sums of per-element ``values`` (e.g. prim measures).

    Children are always created after their parent (pop-order ids), so one
    reverse sweep accumulates bottom-up.
    """
    M = bvh.bb_min.shape[0]
    out = np.zeros((M,), np.float64)
    for nid in range(M - 1, -1, -1):
        c = bvh.count[nid]
        if c > 0:
            s = bvh.start[nid]
            out[nid] = values[bvh.prim_order[s:s + c]].astype(np.float64).sum()
        else:
            out[nid] = out[bvh.left[nid]] + out[bvh.right[nid]]
    return out.astype(np.float32)


def node_normal_cones(bvh: BVHArrays, n1: np.ndarray, n2: np.ndarray,
                      always: np.ndarray):
    """Per-node bounding normal cones for the SNCH silhouette prune.

    Returns (axis (M, D) unit, cos_half (M,)).  cos_half <= -1.5 marks a
    node containing an always-silhouette entity (hole border) — such nodes
    can never be cone-pruned.  The merge is conservative: the node cone
    contains every adjacent-face normal of every entity in the subtree.
    """
    M = bvh.bb_min.shape[0]
    D = n1.shape[1]
    axis = np.zeros((M, D), np.float64)
    half = np.zeros((M,), np.float64)        # half-angle in radians
    flag = np.zeros((M,), bool)

    def merge(a1, t1, a2, t2):
        s = a1 + a2
        ns = np.linalg.norm(s)
        if ns < 1e-9:                        # opposite axes: full sphere
            return a1, np.pi
        ax = s / ns
        ang = max(
            np.arccos(np.clip(np.dot(ax, a1), -1, 1)) + t1,
            np.arccos(np.clip(np.dot(ax, a2), -1, 1)) + t2,
        )
        return ax, min(ang, np.pi)

    for nid in range(M - 1, -1, -1):
        c = bvh.count[nid]
        if c > 0:
            s = bvh.start[nid]
            ids = bvh.prim_order[s:s + c]
            ns = np.concatenate([n1[ids], n2[ids]], axis=0).astype(np.float64)
            ax = ns.sum(0)
            nrm = np.linalg.norm(ax)
            if nrm < 1e-9:
                axis[nid], half[nid] = ns[0], np.pi
            else:
                ax /= nrm
                half[nid] = np.arccos(
                    np.clip((ns @ ax).min(), -1, 1))
                axis[nid] = ax
            flag[nid] = bool(always[ids].any())
        else:
            l, r = bvh.left[nid], bvh.right[nid]
            axis[nid], half[nid] = merge(axis[l], half[l], axis[r], half[r])
            flag[nid] = flag[l] or flag[r]

    cos_half = np.cos(np.minimum(half, np.pi))
    cos_half = np.where(flag, -2.0, cos_half)
    return axis.astype(np.float32), cos_half.astype(np.float32)


def pad_leaf_prims(bvh: BVHArrays, leaf_size: int) -> np.ndarray:
    """(M, leaf_size) prim ids per node (-1 padded; only valid for leaves).

    Gives traversal a fixed-shape gather target per leaf visit.
    """
    M = bvh.bb_min.shape[0]
    out = np.full((M, leaf_size), -1, np.int32)
    for nid in range(M):
        c = bvh.count[nid]
        if c > 0:
            s = bvh.start[nid]
            out[nid, :c] = bvh.prim_order[s : s + c]
    return out


# ---------------------------------------------------------------------------
# Silhouette entities (compute_silhouettes equivalent)
# ---------------------------------------------------------------------------


def _seg_normals(verts: np.ndarray, indices: np.ndarray) -> np.ndarray:
    e = verts[indices[:, 1]] - verts[indices[:, 0]]
    n = np.stack([-e[:, 1], e[:, 0]], axis=-1)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


def _tri_normals(verts: np.ndarray, indices: np.ndarray) -> np.ndarray:
    a, b, c = verts[indices[:, 0]], verts[indices[:, 1]], verts[indices[:, 2]]
    n = np.cross(b - a, c - a)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


def silhouette_entities(verts: np.ndarray, indices: np.ndarray):
    """Returns dict of arrays describing silhouette candidates.

    2D: p0 == p1 == vertex position.  3D: p0/p1 are the edge endpoints.
    ``n1``/``n2`` are adjacent primitive normals (n2 = n1 for boundary
    entities), ``always`` marks entities that are silhouettes from every
    viewpoint (boundary/non-manifold adjacency).
    """
    dim = verts.shape[1]
    if dim == 2:
        normals = _seg_normals(verts, indices)
        adj: dict[int, list[int]] = {}
        for p, (i, j) in enumerate(indices):
            adj.setdefault(int(i), []).append(p)
            adj.setdefault(int(j), []).append(p)
        p0, n1, n2, always = [], [], [], []
        for v_id, prims in adj.items():
            p0.append(verts[v_id])
            if len(prims) == 2:
                n1.append(normals[prims[0]])
                n2.append(normals[prims[1]])
                always.append(False)
            else:
                n1.append(normals[prims[0]])
                n2.append(normals[prims[0]])
                always.append(True)
        p0 = np.asarray(p0, np.float32)
        return dict(
            p0=p0, p1=p0.copy(),
            n1=np.asarray(n1, np.float32), n2=np.asarray(n2, np.float32),
            always=np.asarray(always, bool),
        )

    normals = _tri_normals(verts, indices)
    edges: dict[tuple[int, int], list[int]] = {}
    for p, tri in enumerate(indices):
        for k in range(3):
            i, j = int(tri[k]), int(tri[(k + 1) % 3])
            edges.setdefault((min(i, j), max(i, j)), []).append(p)
    p0, p1, n1, n2, always = [], [], [], [], []
    for (i, j), prims in edges.items():
        p0.append(verts[i])
        p1.append(verts[j])
        if len(prims) == 2:
            n1.append(normals[prims[0]])
            n2.append(normals[prims[1]])
            always.append(False)
        else:
            n1.append(normals[prims[0]])
            n2.append(normals[prims[0]])
            always.append(True)
    return dict(
        p0=np.asarray(p0, np.float32), p1=np.asarray(p1, np.float32),
        n1=np.asarray(n1, np.float32), n2=np.asarray(n2, np.float32),
        always=np.asarray(always, bool),
    )
