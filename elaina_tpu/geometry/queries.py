"""Batched geometric queries over a GeomSet (pure JAX).

TPU-native equivalents of the four snch-lbvh device query types the solver
uses (SURVEY.md §2.1):

* ``closest_point``        — lbvh::nearest + distance_calculator
                             (uniform/integrator.cu:138-157)
* ``closest_silhouette``   — lbvh::nearest_silhouette (SNCH query)
                             (uniform/integrator.cu:189)
* ``ray_intersect``        — lbvh::ray_intersect closest/any-hit
                             (uniform/integrator.cu:287-291, 385-393, 500-503)
* ``sample_in_ball``       — lbvh::sample_object_in_sphere Green-weighted
                             boundary sampling (uniform/integrator.cu:349-365)

Two execution strategies, chosen statically from the primitive count:

* **dense** (P <= BRUTE_FORCE_MAX): one fused (lanes x prims) sweep — the
  ideal TPU shape; used for the small Neumann boundaries of the shipped
  scenes (4-8 segments).
* **BVH traversal** (large P, e.g. the 61k-segment ladybug Dirichlet
  curve): a scalar stack-based descent written once and ``vmap``-ed over
  lanes; under vmap the ``lax.while_loop`` runs all lanes in lockstep until
  the last lane's stack empties, which is exactly the GPU-style "persistent
  threads" traversal mapped onto the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..solver.green import GREEN_R_CLAMP, green_eval
from .geomset import GeomSet
from .primitives import (
    prim_closest_point,
    prim_ray_intersect,
    seg_closest_point,
)

BRUTE_FORCE_MAX = 64
CHUNKED_DENSE_MAX = 4096  # mid-size sets: chunked dense sweep beats traversal on TPU
DEFAULT_STACK = 48


ONEHOT_GATHER_MAX = 64


def small_gather(arr, idx):
    """Row gather that avoids XLA's per-element gather cost for tiny tables.

    XLA TPU gathers cost ~10-20 cycles PER ELEMENT regardless of table
    size; for tables of a few rows (the shipped scenes' Neumann sets) a
    one-hot contraction is pure VPU work and an order of magnitude faster
    inside the per-depth solve step.
    """
    P = arr.shape[0]
    if P > ONEHOT_GATHER_MAX:
        return arr[idx]
    oh = (idx[..., None] == jnp.arange(P, dtype=idx.dtype))
    flat = arr.reshape(P, -1).astype(jnp.float32)
    # HIGHEST: the TPU MXU's default f32 precision is bf16-rounded inputs,
    # which would corrupt gathered coordinates by ~1e-3 relative
    out = jnp.matmul(oh.astype(jnp.float32), flat,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(idx.shape + arr.shape[1:])
    return out.astype(arr.dtype)


def _prim_verts_all(gs: GeomSet):
    """Tuple of dim arrays (P, D)."""
    return tuple(gs.verts[gs.indices[:, k]] for k in range(gs.dim))


def _prim_verts_at(gs: GeomSet, pid):
    """Gather primitive vertices at (possibly padded) prim ids."""
    safe = jnp.maximum(pid, 0)
    if gs.indices.shape[0] <= ONEHOT_GATHER_MAX and pid.ndim == 1:
        corners = jnp.concatenate(
            [gs.verts[gs.indices[:, k]] for k in range(gs.dim)], axis=-1)
        flat = small_gather(corners, safe)             # (N, dim*D)
        D = gs.verts.shape[1]
        return tuple(flat[..., k * D:(k + 1) * D] for k in range(gs.dim))
    idx = gs.indices[safe]
    return tuple(gs.verts[idx[..., k]] for k in range(gs.dim))


def _box_dist(q, lo, hi):
    d = jnp.maximum(jnp.maximum(lo - q, q - hi), 0.0)
    return jnp.linalg.norm(d, axis=-1)


# ---------------------------------------------------------------------------
# Closest point
# ---------------------------------------------------------------------------


def _closest_point_dense(gs: GeomSet, q):
    pv = _prim_verts_all(gs)
    pvb = tuple(v[None, :, :] for v in pv)
    d, _ = prim_closest_point(gs.dim, q[:, None, :], pvb)  # (N, P)
    i = jnp.argmin(d, axis=-1)
    # min == d[argmin]; take_along_axis would lower to a ~19 ns/lane gather
    return jnp.min(d, axis=-1), i.astype(jnp.int32)


def _closest_point_bvh_one(gs: GeomSet, q, stack_size: int):
    dim = gs.dim

    def leaf_update(nid, best_d, best_i):
        pids = gs.leaf_prims[nid]                       # (L,)
        valid = pids >= 0
        pv = _prim_verts_at(gs, pids)                   # each (L, D)
        d, _ = prim_closest_point(dim, q[None, :], pv)
        d = jnp.where(valid, d, jnp.inf)
        j = jnp.argmin(d)
        better = d[j] < best_d
        return (jnp.where(better, d[j], best_d),
                jnp.where(better, pids[j], best_i))

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, stack, best_d, best_i = c
        nid = stack[sp - 1]
        sp = sp - 1
        bd = _box_dist(q, gs.bb_min[nid], gs.bb_max[nid])
        process = bd < best_d
        is_leaf = gs.left[nid] < 0

        nb_d, nb_i = leaf_update(nid, best_d, best_i)
        take = process & is_leaf
        best_d = jnp.where(take, nb_d, best_d)
        best_i = jnp.where(take, nb_i, best_i)

        l, r = gs.left[nid], gs.right[nid]
        dl = _box_dist(q, gs.bb_min[l], gs.bb_max[l])
        dr = _box_dist(q, gs.bb_min[r], gs.bb_max[r])
        near = jnp.where(dl <= dr, l, r)
        far = jnp.where(dl <= dr, r, l)
        d_near, d_far = jnp.minimum(dl, dr), jnp.maximum(dl, dr)

        push = process & (~is_leaf)
        pf = push & (d_far < best_d)
        stack = stack.at[sp].set(jnp.where(pf, far, stack[sp]))
        sp = jnp.where(pf, sp + 1, sp)
        pn = push & (d_near < best_d)
        stack = stack.at[sp].set(jnp.where(pn, near, stack[sp]))
        sp = jnp.where(pn, sp + 1, sp)
        return sp, stack, best_d, best_i

    stack0 = jnp.zeros((stack_size,), jnp.int32)
    init = (jnp.int32(1), stack0, jnp.float32(jnp.inf), jnp.int32(0))
    _, _, best_d, best_i = jax.lax.while_loop(cond, body, init)
    return best_d, best_i


def _closest_point_chunked(gs: GeomSet, q, chunk: int = BRUTE_FORCE_MAX):
    P = gs.n_prims
    n_chunks = -(-P // chunk)

    def body(c, carry):
        best_d, best_i = carry
        start = c * chunk
        pids = start + jnp.arange(chunk)
        valid = pids < P
        pv = _prim_verts_at(gs, jnp.minimum(pids, P - 1))
        d, _ = prim_closest_point(gs.dim, q[:, None, :],
                                  tuple(v[None] for v in pv))
        d = jnp.where(valid[None, :], d, jnp.inf)
        j = jnp.argmin(d, axis=-1)
        d_c = jnp.min(d, axis=-1)
        better = d_c < best_d
        best_i = jnp.where(better, (start + j).astype(jnp.int32), best_i)
        return jnp.minimum(best_d, d_c), best_i

    init = (jnp.full(q.shape[:1], jnp.inf), jnp.zeros(q.shape[:1], jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, init)


def closest_point(gs: GeomSet, q, stack_size: int = DEFAULT_STACK):
    """q: (N, D) -> (dist (N,), prim_id (N,)).

    Dense sweep (small), chunked sweep (mid-size, TPU-friendly), vmapped
    BVH traversal (large; the candidate grid in geometry/grid.py is the
    production accelerator for large sets on TPU)."""
    if gs.n_prims <= BRUTE_FORCE_MAX:
        return _closest_point_dense(gs, q)
    if gs.n_prims <= CHUNKED_DENSE_MAX:
        return _closest_point_chunked(gs, q)
    return jax.vmap(partial(_closest_point_bvh_one, gs, stack_size=stack_size))(q)


def closest_point_detail(gs: GeomSet, q, stack_size: int = DEFAULT_STACK):
    """closest_point plus unclamped projection uv and clamped-uv used for
    the epsilon-shell interior test and color interpolation."""
    from .primitives import prim_project, prim_side

    d, pid = closest_point(gs, q, stack_size)
    pv = _prim_verts_at(gs, pid)
    uv = prim_project(gs.dim, q, pv)
    side = prim_side(gs.dim, q, pv)
    return d, pid, uv, side


# ---------------------------------------------------------------------------
# Closest silhouette point (SNCH query)
# ---------------------------------------------------------------------------


def closest_silhouette(gs: GeomSet, q):
    """q: (N, D) -> distance (N,) to the nearest silhouette entity.

    Dense sweep over the precomputed entities; an entity counts iff its two
    adjacent normals straddle the view vector (or it borders a hole).  The
    shipped scenes have O(10) Neumann silhouette candidates, so the dense
    sweep is both exact and fast; a coned-BVH path can be added for large
    Neumann meshes.
    """
    E = gs.sil_p0.shape[0]
    if E == 0:
        return jnp.full(q.shape[:1], jnp.inf, q.dtype)

    def sweep(p0, p1, n1, n2, always):
        if gs.dim == 2:
            c = p0[None, :, :]                              # (1, e, D)
            d = jnp.linalg.norm(q[:, None, :] - c, axis=-1)  # (N, e)
            v = q[:, None, :] - c
        else:
            d, t = seg_closest_point(q[:, None, :], p0[None], p1[None])
            c = p0[None] + t[..., None] * (p1 - p0)[None]
            v = q[:, None, :] - c
        s1 = jnp.sum(n1[None] * v, axis=-1)
        s2 = jnp.sum(n2[None] * v, axis=-1)
        is_sil = always[None] | (s1 * s2 <= 0.0)
        return jnp.min(jnp.where(is_sil, d, jnp.inf), axis=-1)

    if E <= CHUNKED_DENSE_MAX:
        return sweep(gs.sil_p0, gs.sil_p1, gs.sil_n1, gs.sil_n2, gs.sil_always)

    if gs.sil_bb_min is not None:
        # large Neumann sets: coned-BVH descent, O(log E) per lane instead
        # of the O(E) sweep (snch-lbvh nearest_silhouette parity)
        return jax.vmap(partial(_closest_silhouette_bvh_one, gs))(q)

    # chunked sweep for very large entity sets (bounded memory)
    chunk = CHUNKED_DENSE_MAX
    n_chunks = -(-E // chunk)

    def body(c_idx, best):
        start = c_idx * chunk

        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, jnp.minimum(start, E - chunk),
                                                chunk, 0)

        d = sweep(sl(gs.sil_p0), sl(gs.sil_p1), sl(gs.sil_n1), sl(gs.sil_n2),
                  sl(gs.sil_always))
        return jnp.minimum(best, d)

    return jax.lax.fori_loop(0, n_chunks, body,
                             jnp.full(q.shape[:1], jnp.inf, q.dtype))


SIL_STACK = 64  # balanced median-split tree: depth <= ~2 log2(E)


def _sil_entity_dist(gs: GeomSet, eids, q):
    """Exact silhouette test for entity ids (L,) against one query point:
    distance where the entity is a silhouette from q, inf elsewhere."""
    valid = eids >= 0
    safe = jnp.maximum(eids, 0)
    p0 = gs.sil_p0[safe]
    n1 = gs.sil_n1[safe]
    n2 = gs.sil_n2[safe]
    always = gs.sil_always[safe]
    if gs.dim == 2:
        v = q[None, :] - p0
        d = jnp.linalg.norm(v, axis=-1)
    else:
        p1 = gs.sil_p1[safe]
        d, t = seg_closest_point(q[None, None, :], p0[None], p1[None])
        d, t = d[0], t[0]
        c = p0 + t[:, None] * (p1 - p0)
        v = q[None, :] - c
    s1 = jnp.sum(n1 * v, axis=-1)
    s2 = jnp.sum(n2 * v, axis=-1)
    is_sil = always | (s1 * s2 <= 0.0)
    return jnp.where(valid & is_sil, d, jnp.inf)


def _closest_silhouette_bvh_one(gs: GeomSet, q):
    """Coned-BVH closest-silhouette descent (SNCH, one lane).

    Prunes a node when (a) its box cannot beat the current best distance, or
    (b) its normal cone provably contains no silhouette as seen from q: with
    node cone (a, theta) and the node's bounding-sphere view cone (w, phi),
    every contained normal keeps one dot-product sign iff
    angle(a, w) + theta + phi < pi/2 or angle(a, w) - theta - phi > pi/2
    (snch-lbvh nearest_silhouette; SURVEY.md §2.1).
    """
    half_pi = jnp.float32(jnp.pi / 2)

    def cone_prune(nid):
        lo = gs.sil_bb_min[nid]
        hi = gs.sil_bb_max[nid]
        center = 0.5 * (lo + hi)
        r = 0.5 * jnp.linalg.norm(hi - lo)
        w = center - q
        d_c = jnp.linalg.norm(w)
        cone_cos = gs.sil_cone_cos[nid]
        theta = jnp.arccos(jnp.clip(cone_cos, -1.0, 1.0))
        phi = jnp.arcsin(jnp.clip(r / jnp.maximum(d_c, 1e-20), 0.0, 1.0))
        ang = jnp.arccos(jnp.clip(
            jnp.sum(gs.sil_cone_axis[nid] * w) / jnp.maximum(d_c, 1e-20),
            -1.0, 1.0))
        no_sil = ((ang + theta + phi < half_pi)
                  | (ang - theta - phi > half_pi))
        return (cone_cos > -1.5) & (d_c > r) & no_sil

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, stack, best = c
        nid = stack[sp - 1]
        sp = sp - 1
        bd = _box_dist(q, gs.sil_bb_min[nid], gs.sil_bb_max[nid])
        process = (bd < best) & ~cone_prune(nid)
        is_leaf = gs.sil_left[nid] < 0

        d = jnp.min(_sil_entity_dist(gs, gs.sil_leaf[nid], q))
        best = jnp.where(process & is_leaf, jnp.minimum(best, d), best)

        l, r = gs.sil_left[nid], gs.sil_right[nid]
        dl = _box_dist(q, gs.sil_bb_min[l], gs.sil_bb_max[l])
        dr = _box_dist(q, gs.sil_bb_min[r], gs.sil_bb_max[r])
        near = jnp.where(dl <= dr, l, r)
        far = jnp.where(dl <= dr, r, l)
        d_far = jnp.maximum(dl, dr)
        d_near = jnp.minimum(dl, dr)

        push = process & (~is_leaf)
        pf = push & (d_far < best)
        stack = stack.at[sp].set(jnp.where(pf, far, stack[sp]))
        sp = jnp.where(pf, sp + 1, sp)
        pn = push & (d_near < best)
        stack = stack.at[sp].set(jnp.where(pn, near, stack[sp]))
        sp = jnp.where(pn, sp + 1, sp)
        return sp, stack, best

    init = (jnp.int32(1), jnp.zeros((SIL_STACK,), jnp.int32),
            jnp.float32(jnp.inf))
    _, _, best = jax.lax.while_loop(cond, body, init)
    return best


# ---------------------------------------------------------------------------
# Ray intersection
# ---------------------------------------------------------------------------


def _ray_dense(gs: GeomSet, o, d, tmax):
    pv = _prim_verts_all(gs)
    pvb = tuple(v[None, :, :] for v in pv)
    hit, t = prim_ray_intersect(gs.dim, o[:, None, :], d[:, None, :], pvb,
                                tmax[:, None])              # (N, P)
    i = jnp.argmin(t, axis=-1)
    t_best = jnp.min(t, axis=-1)
    any_hit = jnp.any(hit, axis=-1)
    return any_hit, t_best, i.astype(jnp.int32)


def _ray_box(o, d_inv, lo, hi, t_best):
    t0 = (lo - o) * d_inv
    t1 = (hi - o) * d_inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tn <= tf) & (tf > 0.0) & (tn < t_best), jnp.maximum(tn, 0.0)


def _ray_bvh_one(gs: GeomSet, o, d, tmax, stack_size: int, any_hit: bool):
    dim = gs.dim
    d_inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.sign(d) * 1e12 + 1e12)

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, stack, best_t, best_i, found = c
        nid = stack[sp - 1]
        sp = sp - 1
        bhit, _ = _ray_box(o, d_inv, gs.bb_min[nid], gs.bb_max[nid], best_t)
        process = bhit & (~(found & jnp.bool_(any_hit)))
        is_leaf = gs.left[nid] < 0

        pids = gs.leaf_prims[nid]
        valid = pids >= 0
        pv = _prim_verts_at(gs, pids)
        h, t = prim_ray_intersect(dim, o[None, :], d[None, :], pv,
                                  jnp.broadcast_to(best_t, pids.shape))
        h = h & valid
        t = jnp.where(h, t, jnp.inf)
        j = jnp.argmin(t)
        better = h[j] & (t[j] < best_t)
        take = process & is_leaf
        best_t = jnp.where(take & better, t[j], best_t)
        best_i = jnp.where(take & better, pids[j], best_i)
        found = found | (take & jnp.any(h))

        l, r = gs.left[nid], gs.right[nid]
        hl, tl = _ray_box(o, d_inv, gs.bb_min[l], gs.bb_max[l], best_t)
        hr, tr = _ray_box(o, d_inv, gs.bb_min[r], gs.bb_max[r], best_t)
        near = jnp.where(tl <= tr, l, r)
        far = jnp.where(tl <= tr, r, l)
        h_near = jnp.where(tl <= tr, hl, hr)
        h_far = jnp.where(tl <= tr, hr, hl)

        push = process & (~is_leaf)
        pf = push & h_far
        stack = stack.at[sp].set(jnp.where(pf, far, stack[sp]))
        sp = jnp.where(pf, sp + 1, sp)
        pn = push & h_near
        stack = stack.at[sp].set(jnp.where(pn, near, stack[sp]))
        sp = jnp.where(pn, sp + 1, sp)
        return sp, stack, best_t, best_i, found

    stack0 = jnp.zeros((stack_size,), jnp.int32)
    init = (jnp.int32(1), stack0, tmax, jnp.int32(0), jnp.bool_(False))
    _, _, best_t, best_i, found = jax.lax.while_loop(cond, body, init)
    return found, jnp.where(found, best_t, jnp.inf), best_i


def _ray_dense_chunked(gs: GeomSet, o, d, tmax, chunk: int = BRUTE_FORCE_MAX):
    """Mid-size prim sets: chunked lanes x prims sweep with a running min —
    lockstep-friendly (no per-lane stacks), bounded memory."""
    P = gs.n_prims
    n_chunks = -(-P // chunk)

    def body(c, carry):
        best_t, best_i = carry
        start = c * chunk
        pids = start + jnp.arange(chunk)
        valid = pids < P
        pv = _prim_verts_at(gs, jnp.minimum(pids, P - 1))
        hit, t = prim_ray_intersect(gs.dim, o[:, None, :], d[:, None, :],
                                    tuple(v[None] for v in pv), tmax[:, None])
        t = jnp.where(hit & valid[None, :], t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        t_c = jnp.min(t, axis=-1)
        better = t_c < best_t
        best_i = jnp.where(better, (start + j).astype(jnp.int32), best_i)
        return jnp.minimum(best_t, t_c), best_i

    init = (jnp.full(o.shape[:1], jnp.inf), jnp.zeros(o.shape[:1], jnp.int32))
    best_t, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    hit = jnp.isfinite(best_t) & (best_t <= tmax)
    return hit, jnp.where(hit, best_t, jnp.inf), best_i


def ray_intersect(gs: GeomSet, o, d, tmax, stack_size: int = DEFAULT_STACK,
                  any_hit: bool = False):
    """(N, D) rays -> (hit (N,), t (N,), prim_id (N,)).

    Closest hit by default; ``any_hit=True`` matches the reference's
    occlusion-only ``ray_intersect<true>`` (uniform/integrator.cu:385-393).
    Strategy: fused dense sweep for small sets, chunked sweep for mid-size
    sets (TPU-friendly), vmapped BVH traversal beyond that (CPU fallback).
    """
    if gs.n_prims <= BRUTE_FORCE_MAX:
        return _ray_dense(gs, o, d, tmax)
    if gs.n_prims <= CHUNKED_DENSE_MAX:
        return _ray_dense_chunked(gs, o, d, tmax)
    fn = partial(_ray_bvh_one, gs, stack_size=stack_size, any_hit=any_hit)
    return jax.vmap(fn)(o, d, tmax)


# ---------------------------------------------------------------------------
# Green-weighted boundary sampling inside the star ball
# ---------------------------------------------------------------------------


def sample_in_ball(gs: GeomSet, q, R, u):
    """Importance-sample a boundary primitive inside ball(q, R).

    Weights = measure_i * G_R(dist(q, prim_i)) for overlapping prims — the
    measure x Green's-weight scheme of lbvh::sample_object_in_sphere
    (uniform/integrator.cu:349-356).  Returns (prim_id, pdf_area) with
    prim_id == -1 / pdf 0 when nothing overlaps; pdf_area is the density per
    unit boundary measure of a point sampled uniformly on the chosen prim,
    so estimator terms divide by it directly (integrator.cu:440-442).
    """
    if gs.n_prims <= BRUTE_FORCE_MAX:
        pv = _prim_verts_all(gs)
        pvb = tuple(v[None, :, :] for v in pv)
        d, _ = prim_closest_point(gs.dim, q[:, None, :], pvb)   # (N, P)
        inside = d < R[:, None]
        gw = green_eval(jnp.maximum(d, GREEN_R_CLAMP), R[:, None], gs.dim)
        w = jnp.where(inside, gs.prim_measure[None] * jnp.maximum(gw, 0.0), 0.0)
        total = jnp.sum(w, axis=-1)
        cdf = jnp.cumsum(w, axis=-1)
        target = u * total
        idx = jnp.sum((target[:, None] >= cdf).astype(jnp.int32), axis=-1)
        idx = jnp.minimum(idx, gs.n_prims - 1)
        slots = jnp.arange(w.shape[-1])[None, :]
        w_sel = jnp.sum(jnp.where(slots == idx[:, None], w, 0.0), axis=-1)
        m_sel = small_gather(gs.prim_measure, idx)
        pdf_area = jnp.where(
            total > 0,
            w_sel / (jnp.maximum(total, 1e-30) * jnp.maximum(m_sel, 1e-30)),
            0.0)
        idx = jnp.where((total > 0) & (w_sel > 0), idx, -1)
        return idx.astype(jnp.int32), pdf_area
    if gs.node_measure is not None:
        # large Neumann sets: single stochastic BVH descent, O(log P) per
        # lane (lbvh::sample_object_in_sphere parity).  The returned pdf
        # is the EXACT density of the descent (product of branch
        # probabilities x leaf CDF pick), so the estimator stays unbiased
        # even though node weights use conservative box-distance bounds.
        return jax.vmap(partial(_sample_in_ball_bvh_one, gs))(q, R, u)
    return _sample_in_ball_chunked(gs, q, R, u)


def _sample_in_ball_bvh_one(gs: GeomSet, q, R, u):
    """Hierarchical Green-weighted in-ball sampling (one lane).

    Descends from the root; at each internal node the children are weighted
    by subtree_measure x G(max(box_dist, clamp), R) (an overestimate of any
    member's true weight — every prim with true weight > 0 keeps nonzero
    selection probability, so support is preserved); the single uniform u
    is rescaled within the chosen branch.  At the leaf, prims are weighted
    exactly and picked by CDF.
    """
    dim = gs.dim

    def node_w(nid):
        bd = _box_dist(q, gs.bb_min[nid], gs.bb_max[nid])
        gw = green_eval(jnp.maximum(bd, GREEN_R_CLAMP), R, dim)
        return jnp.where(bd < R, gs.node_measure[nid] * jnp.maximum(gw, 0.0),
                         0.0)

    def cond(c):
        nid, uu, pdf, dead = c
        return (~dead) & (gs.left[nid] >= 0)

    def body(c):
        nid, uu, pdf, dead = c
        l, r = gs.left[nid], gs.right[nid]
        wl, wr = node_w(l), node_w(r)
        tot = wl + wr
        pl = wl / jnp.maximum(tot, 1e-30)
        go_left = uu < pl
        p_branch = jnp.where(go_left, pl, 1.0 - pl)
        uu = jnp.where(go_left, uu / jnp.maximum(pl, 1e-30),
                       (uu - pl) / jnp.maximum(1.0 - pl, 1e-30))
        uu = jnp.clip(uu, 0.0, 1.0 - 1e-7)
        return (jnp.where(go_left, l, r), uu,
                pdf * jnp.maximum(p_branch, 1e-30), dead | (tot <= 0.0))

    root_w = node_w(jnp.int32(0))
    init = (jnp.int32(0), u, jnp.float32(1.0), root_w <= 0.0)
    nid, uu, pdf, dead = jax.lax.while_loop(cond, body, init)

    # exact leaf weights
    pids = gs.leaf_prims[nid]
    valid = pids >= 0
    pv = _prim_verts_at(gs, pids)
    d, _ = prim_closest_point(dim, q[None, :], pv)
    inside = valid & (d < R)
    gw = green_eval(jnp.maximum(d, GREEN_R_CLAMP), R, dim)
    m = gs.prim_measure[jnp.maximum(pids, 0)]
    w = jnp.where(inside, m * jnp.maximum(gw, 0.0), 0.0)
    total = jnp.sum(w)
    cdf = jnp.cumsum(w)
    target = uu * total
    j = jnp.sum((target >= cdf).astype(jnp.int32))
    j = jnp.minimum(j, w.shape[0] - 1)
    w_sel = w[j]
    m_sel = m[j]
    ok = (~dead) & (total > 0) & (w_sel > 0)
    pdf_area = jnp.where(
        ok,
        pdf * w_sel / (jnp.maximum(total, 1e-30) * jnp.maximum(m_sel, 1e-30)),
        0.0)
    idx = jnp.where(ok, pids[j], -1)
    return idx.astype(jnp.int32), pdf_area


def _sample_in_ball_chunked(gs: GeomSet, q, R, u, chunk: int = BRUTE_FORCE_MAX):
    """Large-P in-ball sampling: two chunked passes (total weight, then a
    CDF walk) — exact, static shapes, bounded memory (N x chunk at a time)."""
    P = gs.n_prims
    n_chunks = -(-P // chunk)

    def chunk_weights(c):
        start = c * chunk
        pids = start + jnp.arange(chunk)
        valid = pids < P
        pv = _prim_verts_at(gs, jnp.minimum(pids, P - 1))
        d, _ = prim_closest_point(gs.dim, q[:, None, :],
                                  tuple(v[None] for v in pv))
        inside = (d < R[:, None]) & valid[None, :]
        gw = green_eval(jnp.maximum(d, GREEN_R_CLAMP), R[:, None], gs.dim)
        measure = gs.prim_measure[jnp.minimum(pids, P - 1)]
        return jnp.where(inside, measure[None] * jnp.maximum(gw, 0.0), 0.0)

    def pass1(c, acc):
        return acc + jnp.sum(chunk_weights(c), axis=-1)

    total = jax.lax.fori_loop(0, n_chunks, pass1, jnp.zeros(q.shape[:1]))
    target = u * total

    def pass2(c, carry):
        cum, idx, w_sel = carry
        w = chunk_weights(c)                                    # (N, C)
        cdf = cum[:, None] + jnp.cumsum(w, axis=-1)
        hits = (target[:, None] < cdf) & (w > 0)
        j = jnp.argmax(hits, axis=-1)
        found = jnp.any(hits, axis=-1) & (idx < 0)
        idx = jnp.where(found, (c * chunk + j).astype(jnp.int32), idx)
        slots = jnp.arange(w.shape[-1])[None, :]
        w_j = jnp.sum(jnp.where(slots == j[:, None], w, 0.0), axis=-1)
        w_sel = jnp.where(found, w_j, w_sel)
        return cum + jnp.sum(w, axis=-1), idx, w_sel

    init = (jnp.zeros(q.shape[:1]), jnp.full(q.shape[:1], -1, jnp.int32),
            jnp.zeros(q.shape[:1]))
    _, idx, w_sel = jax.lax.fori_loop(0, n_chunks, pass2, init)

    m_sel = small_gather(gs.prim_measure, jnp.maximum(idx, 0)) \
        if gs.n_prims <= ONEHOT_GATHER_MAX else gs.prim_measure[jnp.maximum(idx, 0)]
    ok = (total > 0) & (idx >= 0)
    pdf_area = jnp.where(
        ok, w_sel / (jnp.maximum(total, 1e-30) * jnp.maximum(m_sel, 1e-30)), 0.0)
    return jnp.where(ok, idx, -1), pdf_area


def grid_closest_silhouette(sg, gs: GeomSet, q):
    """Banded silhouette query via the SilGrid (grid.build_silhouette_grid).

    q: (N, D) -> (N,) min(nearest-silhouette distance, cell r_cap): exact
    below the cell's validity cap, a conservative LOWER bound otherwise —
    a valid WoSt star radius either way (uniform/integrator.cu:189).
    Replaces the per-lane coned-BVH descent with one row gather + a dense
    K-entity sweep (the TPU-native shape; the Dirichlet path's design,
    SURVEY.md §7 'hard parts' #1).  Out-of-grid queries fall back to the
    distance to the entity-set bbox (the grid covers the scene AABB, so
    those lanes are outside every entity's box: a valid lower bound).
    """
    res = jnp.asarray([r for r in sg.res], jnp.float32)
    rel = (q - sg.origin) * sg.inv_cell
    outside = jnp.any((rel < 0.0) | (rel >= res), axis=-1)
    idx = jnp.clip(rel.astype(jnp.int32), 0,
                   jnp.asarray([r - 1 for r in sg.res], jnp.int32))
    lin = idx[..., 0]
    for d in range(1, len(sg.res)):
        lin = lin * sg.res[d] + idx[..., d]

    if sg.coords is not None:
        # Pallas per-lane DMA sweep: the gather formulation below
        # measured 1668 ns/lane on TPU (tools/tpu_sil_probe.py) — the
        # same XLA-gather floor the Dirichlet band sweep hit before
        # grid_band_dma_*
        from ..geometry.grid import _pallas_interpret
        from ..ops.pallas_queries import sil_band_dma
        K = sg.rows.shape[1]
        d2 = sil_band_dma(jnp.where(outside, -1, lin), q, sg.coords,
                          -(-K // 128), gs.dim,
                          interpret=_pallas_interpret())
        # padded slots carry PAD_COORD (1e9) coordinates: a cell whose
        # whole band fails the sign test wins at ~1e18 — map back to the
        # gather path's "nothing found" (inf, -> r_cap clamp below)
        found = jnp.where(d2 >= 1e17, jnp.inf, jnp.sqrt(d2))
    else:
        ids = sg.rows[lin]                    # (N, K)
        valid = ids >= 0
        safe = jnp.maximum(ids, 0)
        p0 = gs.sil_p0[safe]                  # (N, K, D)
        n1 = gs.sil_n1[safe]
        n2 = gs.sil_n2[safe]
        always = gs.sil_always[safe]
        if gs.dim == 2:
            v = q[:, None, :] - p0
            d = jnp.linalg.norm(v, axis=-1)
        else:
            p1 = gs.sil_p1[safe]
            d, t = seg_closest_point(q[:, None, :], p0, p1)
            c = p0 + t[..., None] * (p1 - p0)
            v = q[:, None, :] - c
        s1 = jnp.sum(n1 * v, axis=-1)
        s2 = jnp.sum(n2 * v, axis=-1)
        is_sil = always | (s1 * s2 <= 0.0)
        found = jnp.min(jnp.where(valid & is_sil, d, jnp.inf), axis=-1)
    capped = jnp.minimum(found, sg.r_cap[lin])
    capped = jnp.where(capped >= 1e29, jnp.inf, capped)

    delta = jnp.maximum(sg.ent_lo - q, 0.0) + jnp.maximum(q - sg.ent_hi, 0.0)
    d_box = jnp.linalg.norm(delta, axis=-1)
    return jnp.where(outside, d_box, capped)


# ---------------------------------------------------------------------------
# radius-complete prim-band queries (grid.PrimBandGrid)
# ---------------------------------------------------------------------------
#
# The Neumann query set of one WoSt step — in-ball Green-weighted prim
# sampling, closest-hit walk ray, any-hit visibility ray — is bounded by
# the star radius R_B.  With R_B clamped to the band's completeness cap
# (wost._separate), ONE row gather per lane supplies a complete candidate
# set for all of them, replacing the vmapped per-lane stack-BVH descent
# (~22 us/lane/step measured on neumann3d, TPU round 4).  The row's
# completeness guarantee is stated at grid.PrimBandGrid / verified in
# tests/test_neumann_band.py; reference counterpart:
# uniform/integrator.cu:318-445 + lbvh ray/sample_object_in_sphere.


def band_cell(bg, q):
    """(lin, outside) — grid cell per query point (out-of-grid clamped)."""
    res = jnp.asarray([r for r in bg.res], jnp.float32)
    rel = (q - bg.origin) * bg.inv_cell
    outside = jnp.any((rel < 0.0) | (rel >= res), axis=-1)
    idx = jnp.clip(rel.astype(jnp.int32), 0,
                   jnp.asarray([r - 1 for r in bg.res], jnp.int32))
    lin = idx[..., 0]
    for d in range(1, len(bg.res)):
        lin = lin * bg.res[d] + idx[..., d]
    return lin, outside


def band_r_cap(bg, q):
    """Completeness radius at q: the cell's r_cap inside the grid; the
    distance to the prim-set bbox outside it (the grid covers the scene
    AABB, so out-of-grid points are outside every prim's box — a ball or
    ray within that distance is provably prim-free)."""
    lin, outside = band_cell(bg, q)
    delta = jnp.maximum(bg.ent_lo - q, 0.0) + jnp.maximum(q - bg.ent_hi, 0.0)
    d_box = jnp.linalg.norm(delta, axis=-1)
    return jnp.where(outside, d_box, bg.r_cap[lin])


def _band_rows(bg, q):
    lin, outside = band_cell(bg, q)
    rows = bg.rows[jnp.where(outside, 0, lin)]           # (N, K)
    valid = (rows >= 0) & ~outside[:, None]
    return rows, valid


def band_ray_intersect(bg, gs: GeomSet, o, d, tmax, ref=None):
    """(hit, t, pid) — closest ray hit over the band row of ``ref``
    (default: the ray origin).  Exact iff every prim the segment can
    touch is in the row: callers guarantee tmax (plus any origin offset
    from ref) stays within band_r_cap(ref) — wost clamps R_B to it.
    ``ref`` matters when the origin is eps-offset off a boundary: the
    offset point can sit in a neighbouring cell whose cap was not the
    one R_B was clamped against."""
    refp = o if ref is None else ref
    if getattr(bg, "coords", None) is not None and gs.dim == 3:
        # Pallas per-lane DMA sweep: zero K-wide corner gathers; only the
        # winning slot's prim id is fetched afterwards
        from .grid import _pallas_interpret
        from ..ops.pallas_queries import band_ray_dma_3d
        lin, outside = band_cell(bg, refp)
        K = bg.rows.shape[1]
        t, slot = band_ray_dma_3d(jnp.where(outside, -1, lin), o, d, tmax,
                                  bg.coords, -(-K // 128),
                                  interpret=_pallas_interpret())
        hit = jnp.isfinite(t) & (t <= tmax) & ~outside
        pid = bg.rows[jnp.where(outside, 0, lin), jnp.minimum(slot, K - 1)]
        return hit, jnp.where(hit, t, jnp.inf), jnp.where(
            hit, jnp.maximum(pid, 0), 0).astype(jnp.int32)
    rows, valid = _band_rows(bg, refp)
    safe = jnp.maximum(rows, 0)
    pv = _prim_verts_at(gs, safe)                        # each (N, K, D)
    hit_k, t_k = prim_ray_intersect(gs.dim, o[:, None, :], d[:, None, :],
                                    pv, tmax[:, None])
    t_k = jnp.where(hit_k & valid, t_k, jnp.inf)
    j = jnp.argmin(t_k, axis=-1)
    t = jnp.min(t_k, axis=-1)
    hit = jnp.isfinite(t) & (t <= tmax)
    pid = jnp.take_along_axis(safe, j[:, None], 1)[:, 0]
    return hit, jnp.where(hit, t, jnp.inf), jnp.where(
        hit, pid, 0).astype(jnp.int32)


class NeumannWalkOut(NamedTuple):
    """Fused per-step Neumann band query results (band_neumann_walk)."""
    pid: jnp.ndarray          # (N,) int32 sampled prim, -1 invalid
    pdf_area: jnp.ndarray     # (N,) surface-area pdf of sample_pt
    sample_pt: jnp.ndarray    # (N, 3)
    side: jnp.ndarray         # (N,) sign of q vs the sampled prim's plane
    plane_n: jnp.ndarray      # (N, 3) sampled prim's plane normal
    #                           (unnormalized cross, prim_normal orientation)
    occluded: jnp.ndarray     # (N,) bool: origin->sample_pt blocked
    whit: jnp.ndarray         # (N,) bool: walk ray hit
    wt: jnp.ndarray           # (N,) walk hit distance (inf on miss)
    wnormal: jnp.ndarray      # (N, 3) walk hit's unit normal (0 on miss)


def band_neumann_walk(bg, gs: GeomSet, q, R, on_n, n_normal, u_sel, u_pt,
                      d_walk, eps):
    """One WoSt step's ENTIRE Neumann band workload in one fused kernel:
    Green-weighted in-ball prim sampling + the sample point's visibility
    ray + the walk ray share a single per-lane cell-block DMA
    (ops/pallas_queries.band_neumann_walk_dma_3d), where the unfused path
    pays three DMA kernels plus the winners' vertex/normal gathers.
    Semantics mirror band_sample_in_ball / band_ray_intersect exactly;
    equivalence is pinned by tests/test_neumann_band.py.  3D + coords
    only — callers gate and fall back to the unfused composition.

    Reference counterpart: sampleNeumannImpl + oneStepWalkImpl
    (uniform/integrator.cu:318-445, 447-526)."""
    from ..ops.pallas_queries import band_neumann_walk_dma_3d
    from .grid import _pallas_interpret
    n = q.shape[0]
    lin, outside = band_cell(bg, q)
    K = bg.rows.shape[1]
    out, slot = band_neumann_walk_dma_3d(
        jnp.where(outside, -1, lin), q, R, on_n, n_normal, u_sel,
        u_pt[:, 0], u_pt[:, 1], d_walk,
        jnp.broadcast_to(jnp.float32(eps), (n,)), bg.coords,
        -(-K // 128), interpret=_pallas_interpret())
    w_sel, total = out[:, 0], out[:, 1]
    slot = jnp.minimum(slot, K - 1)
    pid = jnp.maximum(bg.rows[jnp.where(outside, 0, lin), slot], 0)
    m_sel = small_gather(gs.prim_measure, pid) \
        if gs.n_prims <= ONEHOT_GATHER_MAX else gs.prim_measure[pid]
    ok = (total > 0) & (w_sel > 0) & ~outside
    pdf_area = jnp.where(
        ok, w_sel / (jnp.maximum(total, 1e-30) * jnp.maximum(m_sel, 1e-30)),
        0.0)
    return NeumannWalkOut(
        pid=jnp.where(ok, pid, -1).astype(jnp.int32),
        pdf_area=pdf_area,
        sample_pt=out[:, 2:5],
        side=out[:, 5],
        plane_n=out[:, 6:9],
        occluded=(out[:, 9] > 0) & ~outside,
        whit=(out[:, 10] > 0) & ~outside,
        wt=jnp.where(outside, jnp.inf, out[:, 11]),
        wnormal=jnp.where(outside[:, None], 0.0, out[:, 12:15]),
    )


def band_sample_in_ball(bg, gs: GeomSet, q, R, u):
    """(prim_id, pdf_area) — Green-weighted in-ball prim sampling over
    the band row (sample_in_ball semantics).  With R <= band_r_cap(q)
    the row contains EVERY prim intersecting ball(q, R), so the weights
    — and the returned pdf — are identical to the dense path's."""
    if getattr(bg, "coords", None) is not None and gs.dim == 3:
        from .grid import _pallas_interpret
        from ..ops.pallas_queries import band_ball_dma_3d
        lin, outside = band_cell(bg, q)
        K = bg.rows.shape[1]
        slot, w_sel, total = band_ball_dma_3d(
            jnp.where(outside, -1, lin), q, R, u, bg.coords, -(-K // 128),
            interpret=_pallas_interpret())
        slot = jnp.minimum(slot, K - 1)
        pid = jnp.maximum(bg.rows[jnp.where(outside, 0, lin), slot], 0)
        # pdf uses the precomputed prim measure (the sampling density over
        # the surface is (w_sel/total) x uniform-on-prim 1/measure; the
        # kernel's in-tile area only weights the CDF)
        m_sel = small_gather(gs.prim_measure, pid) \
            if gs.n_prims <= ONEHOT_GATHER_MAX else gs.prim_measure[pid]
        ok = (total > 0) & (w_sel > 0) & ~outside
        pdf_area = jnp.where(
            ok,
            w_sel / (jnp.maximum(total, 1e-30) * jnp.maximum(m_sel, 1e-30)),
            0.0)
        return jnp.where(ok, pid, -1).astype(jnp.int32), pdf_area
    rows, valid = _band_rows(bg, q)
    safe = jnp.maximum(rows, 0)
    pv = _prim_verts_at(gs, safe)
    dd, _ = prim_closest_point(gs.dim, q[:, None, :], pv)   # (N, K)
    inside = valid & (dd < R[:, None])
    gw = green_eval(jnp.maximum(dd, GREEN_R_CLAMP), R[:, None], gs.dim)
    meas = gs.prim_measure[safe]
    w = jnp.where(inside, meas * jnp.maximum(gw, 0.0), 0.0)
    total = jnp.sum(w, axis=-1)
    cdf = jnp.cumsum(w, axis=-1)
    target = u * total
    idx_k = jnp.sum((target[:, None] >= cdf).astype(jnp.int32), axis=-1)
    idx_k = jnp.minimum(idx_k, rows.shape[1] - 1)
    take = lambda a: jnp.take_along_axis(a, idx_k[:, None], 1)[:, 0]
    w_sel = take(w)
    m_sel = take(meas)
    pid = take(safe)
    ok = (total > 0) & (w_sel > 0)
    pdf_area = jnp.where(
        ok, w_sel / (jnp.maximum(total, 1e-30) * jnp.maximum(m_sel, 1e-30)),
        0.0)
    return jnp.where(ok, pid, -1).astype(jnp.int32), pdf_area
