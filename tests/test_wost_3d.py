"""3D uniform WoSt against analytic harmonic solutions (triangle scenes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.core.problem import Boundary, Scene
from elaina_tpu.geometry.geomset import make_geom_set
from elaina_tpu.solver.wost import run_one_sample


def _cube_boundary(n=4, half=1.0, faces=(0, 1, 2, 3, 4, 5)):
    """Triangulated cube surface [-half, half]^3, subdivided n x n per face.

    faces: 0/1 = -x/+x, 2/3 = -y/+y, 4/5 = -z/+z.
    """
    verts, tris = [], []
    for f in faces:
        axis, sign = f // 2, (f % 2) * 2 - 1
        u_ax, v_ax = [a for a in range(3) if a != axis]
        base = len(verts)
        for i in range(n + 1):
            for j in range(n + 1):
                p = np.zeros(3, np.float32)
                p[axis] = sign * half
                p[u_ax] = -half + 2 * half * i / n
                p[v_ax] = -half + 2 * half * j / n
                verts.append(p)
        for i in range(n):
            for j in range(n):
                a = base + i * (n + 1) + j
                b, c, d = a + 1, a + (n + 1), a + (n + 1) + 1
                tris.extend([(a, b, d), (a, d, c)])
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    # weld duplicate vertices so shared face edges get proper two-triangle
    # adjacency (unwelded seams would register as spurious always-silhouette
    # boundary edges and stall walks near them)
    keys = np.round(verts * 1e5).astype(np.int64)
    _, first, inverse = np.unique(keys, axis=0, return_index=True,
                                  return_inverse=True)
    verts = verts[np.sort(first)]
    remap = np.empty(len(first), np.int32)
    order = np.argsort(first)
    remap[order] = np.arange(len(first))
    tris = remap[inverse][tris]
    return verts, tris.astype(np.int32)


def _colors_from_fn(verts, fn):
    vals = np.asarray([fn(v) for v in verts], np.float32)
    colors = np.zeros((len(verts), 2, 3), np.float32)
    colors[:, 0, :] = vals[:, None]
    colors[:, 1, :] = vals[:, None]
    return colors


def _scene3(dirichlet=None, neumann=None, source=None):
    return Scene(
        dirichlet=dirichlet, neumann=neumann, d_grid=None, source=source,
        aabb_lo=jnp.asarray([-1.0, -1.0, -1.0]),
        aabb_hi=jnp.asarray([1.0, 1.0, 1.0]),
        dim=3, source_intensity=1.0, dirichlet_intensity=1.0,
        neumann_intensity=1.0,
    )


def _solve(scene, pts, spp=96, max_depth=32, eps=0.03, seed=0):
    pts = jnp.asarray(pts, jnp.float32)
    mask = jnp.ones((pts.shape[0],), bool)
    key = jax.random.PRNGKey(seed)
    step = jax.jit(lambda k: run_one_sample(
        scene, pts, mask, k, eps=eps, max_depth=max_depth))
    total = jnp.zeros((pts.shape[0], 3))
    for s in range(spp):
        c, _ = step(jax.random.fold_in(key, s))
        total = total + c
    return np.asarray(total / spp)


def test_dirichlet_cube_linear_3d():
    """u = (x+1)/2 harmonic in the cube with matching boundary data."""
    verts, tris = _cube_boundary(n=3)
    gs, _ = make_geom_set(verts, tris)
    colors = _colors_from_fn(verts, lambda v: (v[0] + 1.0) / 2.0)
    scene = _scene3(dirichlet=Boundary(gs=gs, colors=jnp.asarray(colors)))
    pts = np.array([[0.0, 0.0, 0.0], [0.4, -0.3, 0.2], [-0.5, 0.5, -0.5]],
                   np.float32)
    u = _solve(scene, pts, spp=128)
    expected = (pts[:, 0] + 1.0) / 2.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.06)


def test_mixed_cube_3d():
    """x = +-1 faces Dirichlet (u = 0/1), other faces zero-Neumann ->
    u = (x+1)/2."""
    d_verts, d_tris = _cube_boundary(n=3, faces=(0, 1))
    d_gs, _ = make_geom_set(d_verts, d_tris)
    d_colors = _colors_from_fn(d_verts, lambda v: (v[0] + 1.0) / 2.0)
    n_verts, n_tris = _cube_boundary(n=3, faces=(2, 3, 4, 5))
    n_gs, _ = make_geom_set(n_verts, n_tris)
    scene = _scene3(
        dirichlet=Boundary(gs=d_gs, colors=jnp.asarray(d_colors)),
        neumann=Boundary(gs=n_gs,
                         colors=jnp.zeros((len(n_verts), 2, 3), jnp.float32)))
    pts = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, -0.5]], np.float32)
    u = _solve(scene, pts, spp=128, max_depth=96)
    expected = (pts[:, 0] + 1.0) / 2.0
    # walks trapped near Neumann-Neumann cube edges (R_N -> 0) need very
    # deep walks; at depth 96 a small truncation bias remains, exactly as in
    # the reference's maxWalkingDepth-capped solver (fille ships with 128).
    np.testing.assert_allclose(u[:, 0], expected, atol=0.12)


def test_source_ball_3d():
    """-Laplacian u = 1 in the unit ball, u=0 on boundary ->
    u(r) = (1 - r^2) / 6."""
    # icosphere-ish: subdivide an octahedron and normalize
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float32)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    for _ in range(3):  # subdivide
        nv, nf = list(map(tuple, v)), []
        cache = {}

        def mid(a, b):
            k2 = (min(a, b), max(a, b))
            if k2 not in cache:
                m = v[a] + v[b]
                m = m / np.linalg.norm(m)
                cache[k2] = len(nv)
                nv.append(tuple(m))
            return cache[k2]

        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        v = np.asarray(nv, np.float32)
        f = np.asarray(nf, np.int32)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)

    from elaina_tpu.core.problem import SourceGrid
    gs, _ = make_geom_set(v, f)
    res = 32
    source = SourceGrid(
        data=jnp.ones((res, res, res, 3), jnp.float32),
        origin=jnp.asarray([-1.5, -1.5, -1.5]),
        inv_voxel=jnp.asarray([res / 3.0] * 3))
    scene = _scene3(
        dirichlet=Boundary(gs=gs, colors=jnp.zeros((len(v), 2, 3), jnp.float32)),
        source=source)
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.5, 0.0]], np.float32)
    u = _solve(scene, pts, spp=160, eps=0.02)
    r2 = np.sum(pts**2, -1)
    expected = (1.0 - r2) / 6.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.02)
