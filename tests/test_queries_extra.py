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
    pid_d, pdf_d, pid_c, pdf_c = (np.asarray(a)
                                  for a in (pid_d, pdf_d, pid_c, pdf_c))

    # The chunked CDF walk restarts its cumsum per chunk, so a query whose
    # target lands within float rounding of a CDF knife edge may pick the
    # adjacent prim — an equally valid inverse-CDF sample.  Require picks to
    # agree except at knife edges, and verify BOTH paths' (pick, pdf) pairs
    # against independently recomputed exact weights.
    mismatch = pid_d != pid_c
    assert mismatch.mean() < 0.01, f"{mismatch.sum()} mismatched picks"

    pv = tuple(np.asarray(gs.verts)[np.asarray(gs.indices)[:, k]]
               for k in range(2))
    from elaina_tpu.geometry.primitives import prim_closest_point
    from elaina_tpu.solver.green import green_eval
    d = np.asarray(prim_closest_point(
        2, q[:, None, :], tuple(jnp.asarray(v)[None] for v in pv))[0])
    gw = np.asarray(green_eval(jnp.maximum(jnp.asarray(d), Q.GREEN_R_CLAMP),
                               R[:, None], 2))
    w = np.where(d < np.asarray(R)[:, None],
                 np.asarray(gs.prim_measure)[None] * np.maximum(gw, 0.0), 0.0)
    total = w.sum(-1)
    lanes = np.arange(len(total))
    for pid, pdf in ((pid_d, pdf_d), (pid_c, pdf_c)):
        sel = np.maximum(pid, 0)
        w_sel = w[lanes, sel]
        m_sel = np.asarray(gs.prim_measure)[sel]
        ok = pid >= 0
        assert np.all(w_sel[ok] > 0)                   # picked inside ball
        # divide on the ok lanes only: empty-ball lanes hold total == 0
        # and the full-array divide emitted an invalid-divide warning
        np.testing.assert_allclose(
            pdf[ok], w_sel[ok] / (total[ok] * m_sel[ok]), rtol=2e-4)
    # at mismatched lanes the target must sit at a CDF boundary of the picks
    cdf = np.cumsum(w, axis=-1)
    tgt = np.asarray(u) * total
    for lane in np.flatnonzero(mismatch):
        edges = cdf[lane, [min(pid_d[lane], pid_c[lane])]]
        assert np.min(np.abs(edges - tgt[lane])) < 1e-3 * total[lane]


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
