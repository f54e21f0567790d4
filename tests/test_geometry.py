"""Geometry engine validation: BVH queries vs brute force (SURVEY.md §7.3)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.geometry import queries as Q
from elaina_tpu.geometry.geomset import make_geom_set
from elaina_tpu.geometry.primitives import seg_closest_point, tri_closest_point


def _random_polyline_scene(n_curves=40, pts_per_curve=12, seed=0):
    rng = np.random.default_rng(seed)
    verts, indices = [], []
    for _ in range(n_curves):
        base = rng.uniform(-10, 10, 2)
        angle = rng.uniform(0, 2 * math.pi)
        t = np.linspace(0, 1, pts_per_curve)
        wiggle = rng.uniform(0.2, 1.0)
        pts = base + np.stack(
            [3 * t * math.cos(angle) - wiggle * np.sin(6 * t) * math.sin(angle),
             3 * t * math.sin(angle) + wiggle * np.sin(6 * t) * math.cos(angle)], -1)
        s = len(verts)
        verts.extend(pts)
        indices.extend([(s + i, s + i + 1) for i in range(pts_per_curve - 1)])
    return np.asarray(verts, np.float32), np.asarray(indices, np.int32)


def _random_tri_scene(n_tris=300, seed=1):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-5, 5, (n_tris, 3)).astype(np.float32)
    offsets = rng.uniform(-0.8, 0.8, (n_tris, 3, 3)).astype(np.float32)
    verts = (centers[:, None, :] + offsets).reshape(-1, 3)
    indices = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return verts, indices


def test_bvh_closest_point_matches_brute_2d():
    from functools import partial

    import jax

    verts, indices = _random_polyline_scene()
    assert indices.shape[0] > Q.BRUTE_FORCE_MAX
    gs, depth = make_geom_set(verts, indices)
    q = jnp.asarray(np.random.default_rng(2).uniform(-12, 12, (500, 2)), jnp.float32)
    d_bvh, i_bvh = jax.vmap(
        partial(Q._closest_point_bvh_one, gs, stack_size=depth + 4))(q)
    d_ref, _ = Q._closest_point_dense(gs, q)
    # the chunked mid-size sweep (the public path for this prim count) too
    d_chunk, _ = Q._closest_point_chunked(gs, q)
    np.testing.assert_allclose(np.asarray(d_chunk), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_bvh), np.asarray(d_ref), rtol=1e-5, atol=1e-5)
    # the chosen prim must realize the min distance
    a = gs.verts[gs.indices[i_bvh, 0]]
    b = gs.verts[gs.indices[i_bvh, 1]]
    d_check, _ = seg_closest_point(q, a, b)
    np.testing.assert_allclose(np.asarray(d_check), np.asarray(d_ref), rtol=1e-5, atol=1e-5)


def test_bvh_closest_point_matches_brute_3d():
    from functools import partial

    import jax

    verts, indices = _random_tri_scene()
    gs, depth = make_geom_set(verts, indices)
    q = jnp.asarray(np.random.default_rng(3).uniform(-6, 6, (300, 3)), jnp.float32)
    d_bvh, i_bvh = jax.vmap(
        partial(Q._closest_point_bvh_one, gs, stack_size=depth + 4))(q)
    d_ref, _ = Q._closest_point_dense(gs, q)
    np.testing.assert_allclose(np.asarray(d_bvh), np.asarray(d_ref), rtol=1e-4, atol=1e-5)


def test_bvh_ray_matches_brute_2d():
    verts, indices = _random_polyline_scene(seed=7)
    gs, depth = make_geom_set(verts, indices)
    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-12, 12, (400, 2)), jnp.float32)
    ang = rng.uniform(0, 2 * math.pi, 400)
    d = jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1), jnp.float32)
    tmax = jnp.full((400,), 30.0)
    from functools import partial

    import jax

    h_bvh, t_bvh, i_bvh = jax.vmap(partial(
        Q._ray_bvh_one, gs, stack_size=depth + 4, any_hit=False))(o, d, tmax)
    h_ref, t_ref, _ = Q._ray_dense(gs, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(h_bvh), np.asarray(h_ref))
    hit = np.asarray(h_ref)
    np.testing.assert_allclose(
        np.asarray(t_bvh)[hit], np.asarray(t_ref)[hit], rtol=1e-4, atol=1e-5
    )
    # the chunked mid-size sweep (public path for this prim count)
    h_chunk, t_chunk, _ = Q._ray_dense_chunked(gs, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(h_chunk), hit)
    np.testing.assert_allclose(np.asarray(t_chunk)[hit], np.asarray(t_ref)[hit],
                               rtol=1e-4, atol=1e-5)
    # any-hit agrees on hit/miss
    h_any, _, _ = jax.vmap(partial(
        Q._ray_bvh_one, gs, stack_size=depth + 4, any_hit=True))(o, d, tmax)
    np.testing.assert_array_equal(np.asarray(h_any), hit)


def _box_scene():
    # CCW box like data/ladybug/boundary.obj (normals point inward for CCW)
    verts = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float32)
    indices = np.array([[0, 1], [1, 2], [2, 3], [3, 0]], np.int32)
    return verts, indices


def test_silhouette_box_interior():
    """From inside a closed convex box no vertex is a silhouette -> inf."""
    verts, indices = _box_scene()
    gs, _ = make_geom_set(verts, indices)
    q = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, (64, 2)), jnp.float32)
    d = Q.closest_silhouette(gs, q)
    assert np.all(np.isinf(np.asarray(d)))
    # from outside, corners are silhouettes: distance = nearest corner
    q_out = jnp.asarray([[3.0, 0.0], [0.0, -4.0]], jnp.float32)
    d_out = np.asarray(Q.closest_silhouette(gs, q_out))
    assert d_out[0] == pytest.approx(math.hypot(2, 1), rel=1e-5)
    assert d_out[1] == pytest.approx(math.hypot(1, 3), rel=1e-5)


def test_silhouette_open_curve_endpoints():
    """Open-curve endpoints are always silhouette candidates."""
    verts = np.array([[0, 0], [1, 0], [2, 0]], np.float32)
    indices = np.array([[0, 1], [1, 2]], np.int32)
    gs, _ = make_geom_set(verts, indices)
    q = jnp.asarray([[0.0, 1.0], [2.0, 2.0]], jnp.float32)
    d = np.asarray(Q.closest_silhouette(gs, q))
    assert d[0] == pytest.approx(1.0, rel=1e-5)   # endpoint (0,0)
    assert d[1] == pytest.approx(2.0, rel=1e-5)   # endpoint (2,0)


def test_sample_in_ball_unbiased_constant_integrand():
    """MC estimate of the boundary length inside a ball using the returned
    area pdf must match the analytic value: E[1/pdf] = total measure inside."""
    verts, indices = _box_scene()
    gs, _ = make_geom_set(verts, indices)
    n = 200_000
    q = jnp.zeros((n, 2))
    R_val = 1.2  # corners (dist sqrt(2)) stay outside the ball
    R = jnp.full((n,), R_val)
    u = jax.random.uniform(jax.random.PRNGKey(0), (n,))
    pid, pdf = Q.sample_in_ball(gs, q, R, u)
    pid_np, pdf_np = np.asarray(pid), np.asarray(pdf)
    assert np.all(pid_np >= 0)
    # sample a point uniformly on the chosen prim and keep r < R samples:
    # estimator of length{boundary inside ball} = mean(indicator / pdf_point)
    u2 = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (n,)))
    a = verts[indices[pid_np, 0]]
    b = verts[indices[pid_np, 1]]
    pts = a + u2[:, None] * (b - a)
    r = np.linalg.norm(pts, axis=-1)
    est = np.mean((r < R_val) / pdf_np)
    # each side intersects the ball in a chord of half-length sqrt(R^2-1)
    expected = 4 * 2 * math.sqrt(R_val**2 - 1.0)
    assert est == pytest.approx(expected, rel=2e-2)


def test_sample_in_ball_no_overlap():
    verts, indices = _box_scene()
    gs, _ = make_geom_set(verts, indices)
    q = jnp.full((4, 2), 100.0)
    R = jnp.full((4,), 1.0)
    u = jnp.linspace(0.1, 0.9, 4)
    pid, pdf = Q.sample_in_ball(gs, q, R, u)
    assert np.all(np.asarray(pid) == -1)
    assert np.all(np.asarray(pdf) == 0.0)


def test_closest_point_detail_interior_test():
    verts, indices = _box_scene()
    gs, _ = make_geom_set(verts, indices)
    q = jnp.asarray([[0.0, -0.95], [1.3, -1.3]], jnp.float32)
    d, pid, uv, side = Q.closest_point_detail(gs, q)
    d = np.asarray(d)
    assert d[0] == pytest.approx(0.05, abs=1e-5)
    # corner query: nearest point is the shared vertex, uv hits an endpoint
    assert d[1] == pytest.approx(math.hypot(0.3, 0.3), rel=1e-5)
    uv = np.asarray(uv)
    assert 0.0 < uv[0] < 1.0
    assert uv[1] <= 0.0 or uv[1] >= 1.0
