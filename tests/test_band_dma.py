"""Pallas DMA prim-band queries (ops/pallas_queries.band_ray_dma_3d /
band_ball_dma_3d) vs the gather formulation they replace.

The DMA kernels must be drop-in equivalents of the XLA-gather band
queries (geometry/queries.band_ray_intersect / band_sample_in_ball):
same hits, same t, same selected prims, same pdf.  CDF boundaries can
flip under f32 reassociation (the kernel's prefix sums run as a
triangular matmul, the gather path as jnp.cumsum), so the in-ball
comparison allows a sub-percent slot-mismatch tail and checks the pdf
formula on the matching lanes.  Reference counterpart:
lbvh ray_intersect / sample_object_in_sphere
(uniform/integrator.cu:287-291, 349-365).
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

import elaina_tpu.geometry.queries as Q
from elaina_tpu.geometry.geomset import make_geom_set
from elaina_tpu.geometry.grid import build_prim_band_grid
from elaina_tpu.geometry.native import prim_bands_available

pytestmark = pytest.mark.skipif(not prim_bands_available(),
                                reason="native prim_band_rows unavailable")


@pytest.fixture()
def soup(monkeypatch):
    monkeypatch.setenv("ELAINA_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(11)
    n_tri = 180
    centers = rng.uniform(-2, 2, (n_tri, 3)).astype(np.float32)
    offs = rng.uniform(-0.35, 0.35, (n_tri, 3, 3)).astype(np.float32)
    verts = (centers[:, None] + offs).reshape(-1, 3)
    idx = np.arange(3 * n_tri, dtype=np.int32).reshape(-1, 3)
    lo = np.full(3, -3, np.float32)
    hi = np.full(3, 3, np.float32)
    gs, _ = make_geom_set(verts, idx)
    bg = build_prim_band_grid(verts, idx, lo, hi, K=16, max_res=6)
    assert bg.coords is not None, "interpret mode must attach the DMA table"
    return gs, bg, rng


def test_band_ray_dma_matches_gather(soup):
    gs, bg, rng = soup
    n = 512
    q = rng.uniform(-3.4, 3.4, (n, 3)).astype(np.float32)  # some out-of-grid
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # equivalence (not completeness): both paths sweep the SAME band row,
    # so they must agree for any tmax — use generous ones to get hits
    tmax = rng.uniform(0.5, 3.0, n).astype(np.float32)

    args = (jnp.asarray(q), jnp.asarray(d), jnp.asarray(tmax))
    hit_a, t_a, pid_a = Q.band_ray_intersect(bg, gs, *args)
    bg_nc = dataclasses.replace(bg, coords=None)
    hit_b, t_b, pid_b = Q.band_ray_intersect(bg_nc, gs, *args)

    assert bool(jnp.any(hit_b)), "degenerate fixture: no ray hits at all"
    np.testing.assert_array_equal(np.asarray(hit_a), np.asarray(hit_b))
    np.testing.assert_allclose(np.asarray(t_a)[np.asarray(hit_a)],
                               np.asarray(t_b)[np.asarray(hit_b)],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(pid_a), np.asarray(pid_b))


def test_band_ray_dma_ref_cell(soup):
    """The eps-offset origin uses ``ref``'s cell, not its own."""
    gs, bg, rng = soup
    n = 256
    ref = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    o = ref + rng.normal(size=(n, 3)).astype(np.float32) * 0.01
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = rng.uniform(0.5, 2.0, n).astype(np.float32)

    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax))
    kw = dict(ref=jnp.asarray(ref))
    hit_a, t_a, pid_a = Q.band_ray_intersect(bg, gs, *args, **kw)
    bg_nc = dataclasses.replace(bg, coords=None)
    hit_b, t_b, pid_b = Q.band_ray_intersect(bg_nc, gs, *args, **kw)
    np.testing.assert_array_equal(np.asarray(hit_a), np.asarray(hit_b))
    np.testing.assert_array_equal(np.asarray(pid_a), np.asarray(pid_b))


def test_band_ball_dma_matches_gather(soup):
    gs, bg, rng = soup
    n = 2048
    q = rng.uniform(-3.2, 3.2, (n, 3)).astype(np.float32)
    # equivalence, not completeness: both paths weigh the SAME band row
    R = rng.uniform(0.3, 2.0, n).astype(np.float32)
    u = rng.uniform(0, 1, n).astype(np.float32)

    args = (jnp.asarray(q), jnp.asarray(R), jnp.asarray(u))
    pid_a, pdf_a = Q.band_sample_in_ball(bg, gs, *args)
    bg_nc = dataclasses.replace(bg, coords=None)
    pid_b, pdf_b = Q.band_sample_in_ball(bg_nc, gs, *args)

    pid_a = np.asarray(pid_a)
    pid_b = np.asarray(pid_b)
    valid_b = pid_b >= 0
    assert valid_b.sum() > n // 8, "degenerate fixture: almost no samples"
    # validity masks agree exactly (both derive from total > 0)
    np.testing.assert_array_equal(pid_a >= 0, valid_b)
    # CDF boundaries may flip under f32 reassociation on a tiny tail
    match = pid_a == pid_b
    assert (match | ~valid_b).mean() > 0.995, (
        f"slot mismatch on {(~match & valid_b).sum()} lanes")
    sel = match & valid_b
    np.testing.assert_allclose(np.asarray(pdf_a)[sel],
                               np.asarray(pdf_b)[sel], rtol=2e-4)


def test_band_ball_dma_pdf_normalization(soup):
    """Sum over prims of P(select prim) must be 1 where any weight is
    positive: re-evaluate the DMA path with u sweeping the unit interval
    and check every selected pdf is positive and finite."""
    gs, bg, rng = soup
    n = 64
    q = np.repeat(rng.uniform(-1.5, 1.5, (4, 3)), n // 4, 0).astype(
        np.float32)
    R = np.full(n, 1.5, np.float32)
    u = np.tile(np.linspace(0.001, 0.999, n // 4), 4).astype(np.float32)
    pid, pdf = Q.band_sample_in_ball(bg, gs, jnp.asarray(q), jnp.asarray(R),
                                     jnp.asarray(u))
    pid = np.asarray(pid)
    pdf = np.asarray(pdf)
    ok = pid >= 0
    assert np.all(np.isfinite(pdf[ok])) and np.all(pdf[ok] > 0)
    assert np.all(pdf[~ok] == 0)
