"""Candidate-grid accelerator: exactness vs brute force (geometry/grid.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from elaina_tpu.geometry.grid import build_candidate_grid, grid_closest_point
from elaina_tpu.geometry.primitives import seg_closest_point, tri_closest_point


def test_grid_exact_2d():
    t = np.linspace(0, 2 * math.pi, 400, endpoint=False)
    r = 3 + np.sin(5 * t)
    verts = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(400), (np.arange(400) + 1) % 400], -1).astype(np.int32)
    lo, hi = np.array([-5, -5], np.float32), np.array([5, 5], np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=40, max_res=512)
    assert float(grid.coverage) == 1.0

    q = jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (3000, 2)), jnp.float32)
    d, pid = grid_closest_point(grid, jnp.asarray(verts), jnp.asarray(idx), q)
    a, b = verts[idx[:, 0]][None], verts[idx[:, 1]][None]
    db = jnp.min(seg_closest_point(np.asarray(q)[:, None, :], a, b)[0], axis=1)
    np.testing.assert_allclose(np.asarray(d), np.asarray(db), rtol=1e-6, atol=1e-6)


def test_grid_exact_3d():
    rng = np.random.default_rng(1)
    centers = rng.uniform(-3, 3, (120, 3)).astype(np.float32)
    offs = rng.uniform(-0.5, 0.5, (120, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(360, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -4, np.float32)
    hi = np.full(3, 4, np.float32)
    grid = build_candidate_grid(verts, idx, lo, hi, K=48, max_res=64)
    q = jnp.asarray(rng.uniform(-4, 4, (500, 3)), jnp.float32)
    d, pid = grid_closest_point(grid, jnp.asarray(verts), jnp.asarray(idx), q)
    a = verts[idx[:, 0]][None]
    b = verts[idx[:, 1]][None]
    c = verts[idx[:, 2]][None]
    db, _ = tri_closest_point(np.asarray(q)[:, None, :], a, b, c)
    db = jnp.min(db, axis=1)
    if float(grid.coverage) == 1.0:
        np.testing.assert_allclose(np.asarray(d), np.asarray(db), rtol=1e-5, atol=1e-5)
    else:  # band did not fit K at max_res: still expect near-exact results
        assert float(jnp.mean(jnp.abs(d - db) < 1e-4)) > 0.99
