"""Segment / triangle primitive math (pure JAX, batched).

TPU-native equivalents of the snch-lbvh per-primitive helpers the reference
calls into (SURVEY.md §2.1; call sites integrator/uniform/integrator.cu:
138-156 closest point/side/uv, 287-291 ray, 349-365 sphere sampling).
Conventions (the snch-lbvh submodule is empty upstream, so these are fixed
here and used consistently everywhere):

* 2D segment (a, b): normal = normalize((-(b-a).y, (b-a).x)) (CCW perp).
  ``side(q) = sign(dot(q - a, normal))`` — +1 on the normal side ("left"
  color of the two-sided vertex-color pairs), -1 opposite.
* 3D triangle (a, b, c): normal = normalize(cross(b-a, c-a)).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.mathops import normalize


# ---------------------------------------------------------------------------
# 2D segments
# ---------------------------------------------------------------------------


def seg_normal(a, b):
    e = b - a
    return normalize(jnp.stack([-e[..., 1], e[..., 0]], axis=-1))


def seg_project_ratio(q, a, b):
    """Unclamped projection parameter t of q onto line(a, b).

    ``computeProjectionRatio`` equivalent; the epsilon-shell interior test
    uses 0 < t < 1 (uniform/integrator.cu:149,161).
    """
    e = b - a
    den = jnp.maximum(jnp.sum(e * e, axis=-1), 1e-30)
    return jnp.sum((q - a) * e, axis=-1) / den


def seg_closest_point(q, a, b):
    """(distance, t_clamped) from q to segment ab."""
    t = jnp.clip(seg_project_ratio(q, a, b), 0.0, 1.0)
    p = a + t[..., None] * (b - a)
    return jnp.linalg.norm(q - p, axis=-1), t


def seg_side(q, a, b):
    """{-1, 0, +1}: which side of the segment's supporting line q lies on.

    sign(cross(b - a, q - a)) == sign(dot(q - a, normal)).
    """
    e = b - a
    w = q - a
    cr = e[..., 0] * w[..., 1] - e[..., 1] * w[..., 0]
    return jnp.sign(cr)


def ray_seg_intersect(o, d, a, b, tmax):
    """Ray o + t*d vs segment ab; returns (hit, t).

    Hit requires t in (eps, tmax] and s in [0, 1].
    """
    e = b - a
    denom = d[..., 0] * (-e[..., 1]) - d[..., 1] * (-e[..., 0])  # cross(d, -e)
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    ao = a - o
    t = (ao[..., 0] * (-e[..., 1]) - ao[..., 1] * (-e[..., 0])) / safe
    s = (d[..., 0] * ao[..., 1] - d[..., 1] * ao[..., 0]) / safe
    hit = (jnp.abs(denom) > 1e-12) & (t > 1e-6) & (t <= tmax) & (s >= 0.0) & (s <= 1.0)
    return hit, jnp.where(hit, t, jnp.inf)


def seg_length(a, b):
    return jnp.linalg.norm(b - a, axis=-1)


# ---------------------------------------------------------------------------
# 3D triangles
# ---------------------------------------------------------------------------


def tri_normal(a, b, c):
    return normalize(jnp.cross(b - a, c - a))


def tri_project_bary(q, a, b, c):
    """Unclamped barycentric (u, v) of q projected onto the triangle plane,
    with p = a + u*(b-a) + v*(c-a); interior test is u>0, v>0, u+v<1
    (uniform/integrator.cu:165-167)."""
    e1 = b - a
    e2 = c - a
    w = q - a
    d11 = jnp.sum(e1 * e1, axis=-1)
    d12 = jnp.sum(e1 * e2, axis=-1)
    d22 = jnp.sum(e2 * e2, axis=-1)
    w1 = jnp.sum(w * e1, axis=-1)
    w2 = jnp.sum(w * e2, axis=-1)
    den = jnp.maximum(d11 * d22 - d12 * d12, 1e-30)
    u = (d22 * w1 - d12 * w2) / den
    v = (d11 * w2 - d12 * w1) / den
    return u, v


def tri_closest_point(q, a, b, c):
    """(distance, (u, v) clamped to the triangle) — standard region walk."""
    u, v = tri_project_bary(q, a, b, c)
    w = 1.0 - u - v

    # Clamp to the triangle: project onto each edge and pick the closest
    # among interior / three edges.
    def edge_pt(p0, p1):
        t = jnp.clip(
            jnp.sum((q - p0) * (p1 - p0), axis=-1)
            / jnp.maximum(jnp.sum((p1 - p0) ** 2, axis=-1), 1e-30),
            0.0,
            1.0,
        )
        return p0 + t[..., None] * (p1 - p0)

    inside = (u >= 0.0) & (v >= 0.0) & (w >= 0.0)
    p_in = a + u[..., None] * (b - a) + v[..., None] * (c - a)
    cands = jnp.stack([edge_pt(a, b), edge_pt(b, c), edge_pt(c, a)], axis=-2)
    d_cands = jnp.linalg.norm(q[..., None, :] - cands, axis=-1)
    i_min = jnp.argmin(d_cands, axis=-1)
    p_edge = jnp.take_along_axis(cands, i_min[..., None, None], axis=-2)[..., 0, :]
    p = jnp.where(inside[..., None], p_in, p_edge)
    dist = jnp.linalg.norm(q - p, axis=-1)
    # barycentrics of the clamped point
    uc, vc = tri_project_bary(p, a, b, c)
    return dist, (uc, vc)


def tri_side(q, a, b, c):
    n = jnp.cross(b - a, c - a)
    return jnp.sign(jnp.sum((q - a) * n, axis=-1))


def ray_tri_intersect(o, d, a, b, c, tmax):
    """Moller-Trumbore; returns (hit, t)."""
    e1 = b - a
    e2 = c - a
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    tvec = o - a
    u = jnp.sum(tvec * p, axis=-1) / safe
    qv = jnp.cross(tvec, e1)
    v = jnp.sum(d * qv, axis=-1) / safe
    t = jnp.sum(e2 * qv, axis=-1) / safe
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-6)
        & (t <= tmax)
    )
    return hit, jnp.where(hit, t, jnp.inf)


def tri_area(a, b, c):
    return 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)


# ---------------------------------------------------------------------------
# Dimension-generic dispatch over gathered primitive vertices.
# ``verts``: tuple of DIM arrays (..., D).
# ---------------------------------------------------------------------------


def prim_closest_point(dim: int, q, verts):
    """Returns (dist, uv) where uv is t (2D) or (u, v) stacked (3D)."""
    if dim == 2:
        d, t = seg_closest_point(q, verts[0], verts[1])
        return d, t
    d, (u, v) = tri_closest_point(q, verts[0], verts[1], verts[2])
    return d, jnp.stack([u, v], axis=-1)


def prim_project(dim: int, q, verts):
    if dim == 2:
        return seg_project_ratio(q, verts[0], verts[1])
    u, v = tri_project_bary(q, verts[0], verts[1], verts[2])
    return jnp.stack([u, v], axis=-1)


def prim_side(dim: int, q, verts):
    if dim == 2:
        return seg_side(q, verts[0], verts[1])
    return tri_side(q, verts[0], verts[1], verts[2])


def prim_normal(dim: int, verts):
    if dim == 2:
        return seg_normal(verts[0], verts[1])
    return tri_normal(verts[0], verts[1], verts[2])


def prim_ray_intersect(dim: int, o, d, verts, tmax):
    if dim == 2:
        return ray_seg_intersect(o, d, verts[0], verts[1], tmax)
    return ray_tri_intersect(o, d, verts[0], verts[1], verts[2], tmax)


def prim_measure(dim: int, verts):
    if dim == 2:
        return seg_length(verts[0], verts[1])
    return tri_area(verts[0], verts[1], verts[2])


def prim_sample_point(dim: int, verts, u1, u2):
    """Uniform point on the primitive (lbvh::sample_on_object equivalent)."""
    if dim == 2:
        return verts[0] + u1[..., None] * (verts[1] - verts[0])
    su = jnp.sqrt(u1)
    b0 = 1.0 - su
    b1 = u2 * su
    return (
        verts[0] * b0[..., None]
        + verts[1] * b1[..., None]
        + verts[2] * (1.0 - b0 - b1)[..., None]
    )
