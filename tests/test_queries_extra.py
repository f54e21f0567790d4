"""Equivalence of the chunked query paths vs the fused dense paths."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from elaina_tpu.geometry import queries as Q
from elaina_tpu.geometry.geomset import make_geom_set


def _ring(n=48, r=2.0):
    t = np.linspace(0, 2 * math.pi, n + 1)[:-1]
    verts = np.stack([r * np.cos(t), r * np.sin(t)], -1).astype(np.float32)
    idx = np.stack([np.arange(n), (np.arange(n) + 1) % n], -1).astype(np.int32)
    return verts, idx


def test_sample_in_ball_chunked_matches_dense():
    verts, idx = _ring()
    gs, _ = make_geom_set(verts, idx)
    n = 512
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    R = jnp.asarray(rng.uniform(0.5, 3.5, (n,)), jnp.float32)
    u = jnp.asarray(rng.uniform(size=(n,)), jnp.float32)

    pid_d, pdf_d = Q.sample_in_ball(gs, q, R, u)       # dense (48 <= 64)
    pid_c, pdf_c = Q._sample_in_ball_chunked(gs, q, R, u, chunk=16)
    np.testing.assert_array_equal(np.asarray(pid_d), np.asarray(pid_c))
    np.testing.assert_allclose(np.asarray(pdf_d), np.asarray(pdf_c),
                               rtol=1e-5, atol=1e-7)


def test_silhouette_chunked_matches_dense(monkeypatch):
    # force the chunked path by lowering the threshold
    verts, idx = _ring(128)
    gs, _ = make_geom_set(verts, idx)
    q = jnp.asarray(np.random.default_rng(1).uniform(-4, 4, (300, 2)),
                    jnp.float32)
    d_dense = Q.closest_silhouette(gs, q)
    monkeypatch.setattr(Q, "CHUNKED_DENSE_MAX", 32)
    d_chunk = Q.closest_silhouette(gs, q)
    np.testing.assert_allclose(np.asarray(d_dense), np.asarray(d_chunk),
                               rtol=1e-6, atol=1e-6)
