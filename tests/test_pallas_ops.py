"""Pallas kernels vs jnp references (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from elaina_tpu.geometry.primitives import seg_closest_point
from elaina_tpu.ops.pallas_queries import (
    candidate_band_pallas,
    closest_point_dense_pallas,
)


def _segments(n=50, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    b = (a + rng.uniform(-1, 1, (n, 2))).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


def test_dense_closest_point_kernel_matches_reference():
    a, b = _segments()
    q = jnp.asarray(np.random.default_rng(1).uniform(-6, 6, (300, 2)),
                    jnp.float32)
    dist, idx = closest_point_dense_pallas(q, a, b, interpret=True)
    d_ref, _ = seg_closest_point(q[:, None, :], a[None], b[None])
    best_ref = jnp.min(d_ref, axis=1)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(best_ref),
                               rtol=1e-5, atol=1e-6)
    # chosen prim realizes the min distance
    d_at_idx = jnp.take_along_axis(d_ref, idx[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(np.asarray(d_at_idx), np.asarray(best_ref),
                               rtol=1e-5, atol=1e-6)


def test_candidate_band_kernel_matches_reference():
    rng = np.random.default_rng(2)
    n, K = 200, 16
    vax = rng.uniform(-5, 5, (n, K)).astype(np.float32)
    vay = rng.uniform(-5, 5, (n, K)).astype(np.float32)
    vbx = (vax + rng.uniform(-1, 1, (n, K))).astype(np.float32)
    vby = (vay + rng.uniform(-1, 1, (n, K))).astype(np.float32)
    valid = rng.uniform(size=(n, K)) > 0.3
    valid[:, 0] = True  # at least one candidate per lane
    q = rng.uniform(-6, 6, (n, 2)).astype(np.float32)

    dist, slot = candidate_band_pallas(
        jnp.asarray(q), jnp.asarray(vax), jnp.asarray(vay), jnp.asarray(vbx),
        jnp.asarray(vby), jnp.asarray(valid), interpret=True)

    a = np.stack([vax, vay], -1)
    b = np.stack([vbx, vby], -1)
    d_ref, _ = seg_closest_point(jnp.asarray(q)[:, None, :], jnp.asarray(a),
                                 jnp.asarray(b))
    d_ref = jnp.where(jnp.asarray(valid), d_ref, jnp.inf)
    best_ref = jnp.min(d_ref, axis=1)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(best_ref),
                               rtol=1e-5, atol=1e-6)
    sel = np.take_along_axis(np.asarray(d_ref), np.asarray(slot)[:, None], 1)[:, 0]
    np.testing.assert_allclose(sel, np.asarray(best_ref), rtol=1e-5, atol=1e-6)
