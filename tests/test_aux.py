"""Auxiliary subsystems: config, evaluation grid, film/IO, tonemaps, EMA,
checkpointing, debug tracing, VMFBeta kernel."""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.core.config import ExperimentConfig, IntegratorSettings, json_get
from elaina_tpu.core.evaluation_grid import EvaluationGrid
from elaina_tpu.output.film import Film
from elaina_tpu.output.image_io import read_exr, write_exr
from elaina_tpu.output.tonemapping import apply_tone
from elaina_tpu.utils.ema import Ema


def test_config_parses_reference_schema(tmp_path):
    """The shipped reference config schema must parse verbatim
    (data/ladybug/n.json layout; exec.cu:65-143)."""
    conf = {
        "dimensionality": 2, "base_path": "./exp/", "exp_name": "t",
        "print_network": False,
        "integrator": {
            "setting": {"frameSize": [64, 64], "maxWalkingDepth": 64,
                        "samplesPerPixel": 1024, "trainSppCount": 256,
                        "uniformFractionInGuidingPhase": 0.5,
                        "epsilonShell": 1},
            "type": "guided", "channels": ["SOLUTION"]},
        "export": [{"type": "energy", "tone": "IDL_RDBU",
                    "channel": "SOLUTION", "file_name": "e"}],
        "network": {"encoding": {"otype": "DenseGrid"}},
        "scene": {"aabb": {"min": [-1, -1], "max": [1, 1]},
                  "evaluation_grid": {"mData": {"scale": 1, "pos": [0, 0],
                                                "up": [0, 1]}},
                  "mesh": {}},
    }
    p = tmp_path / "c.json"
    p.write_text(json.dumps(conf))
    cfg = ExperimentConfig.from_file(str(p))
    assert cfg.integrator_type == "guided"
    assert cfg.settings.samplesPerPixel == 1024
    assert cfg.settings.trainSppCount == 256
    assert cfg.settings.epsilonShell == 1
    assert cfg.exports[0].tone == "IDL_RDBU"
    assert json_get(conf, "scene/aabb/min") == [-1, -1]
    assert json_get(conf, "scene/missing/key", default=7) == 7


def test_evaluation_grid_2d_mapping():
    # evaluation_grid.h:29-32: u = (up.y, -up.x), v = up
    grid = EvaluationGrid.from_json(
        {"mData": {"scale": 250, "pos": [250, 250], "up": [-1, 0]}}, 2)
    pts = np.asarray(grid.points(jnp.asarray([0]), (1024, 1024)))
    # pixel (0,0): ndc (-1,-1); u = (0, 1), v = (-1, 0)
    np.testing.assert_allclose(pts[0], [250 * (-1 * 0 + -1 * -1) + 250,
                                        250 * (-1 * 1 + -1 * 0) + 250])


def test_evaluation_grid_3d_mapping():
    grid = EvaluationGrid.from_json(
        {"mData": {"scale": 2, "pos": [0, 0, 5], "up": [0, 0, 1],
                   "right": [1, 0, 0]}}, 3)
    pts = np.asarray(grid.points(jnp.asarray([0, 512 + 512 * 1024]),
                                 (1024, 1024)))
    np.testing.assert_allclose(pts[0], [-2, 0, 3])
    np.testing.assert_allclose(pts[1], [0, 0, 5], atol=0.01)


def test_film_accumulation_and_exr(tmp_path):
    film = Film((8, 4))
    film.put_frame(np.full((4, 8, 3), 0.25, np.float32))
    film.put_frame(np.full((4, 8, 3), 0.75, np.float32))
    px = film.pixels()
    np.testing.assert_allclose(px[..., :3], 0.5, rtol=1e-6)
    path = str(tmp_path / "f.exr")
    film.save(path)
    back = read_exr(path)
    np.testing.assert_allclose(back[..., :3], 0.5, rtol=1e-6)
    film.save(str(tmp_path / "f.png"))
    assert os.path.exists(tmp_path / "f.png")


def test_exr_roundtrip_random(tmp_path):
    img = np.random.default_rng(0).normal(size=(5, 7, 3)).astype(np.float32)
    path = str(tmp_path / "r.exr")
    write_exr(path, img)
    np.testing.assert_array_equal(read_exr(path), img)


def test_pfm_roundtrip(tmp_path):
    from elaina_tpu.output.image_io import read_pfm, write_pfm

    rng = np.random.default_rng(1)
    for c in (1, 3):
        img = rng.normal(size=(6, 9, c)).astype(np.float32)
        path = str(tmp_path / f"t{c}.pfm")
        write_pfm(path, img)
        np.testing.assert_array_equal(read_pfm(path), img)


def test_hdr_roundtrip(tmp_path):
    """Radiance RGBE roundtrip: RLE scanlines (w >= 8) and flat fallback.
    RGBE quantizes the mantissa to 8 bits -> ~0.4% relative tolerance."""
    from elaina_tpu.output.image_io import read_hdr, write_hdr

    rng = np.random.default_rng(3)
    for w in (16, 5):                      # RLE path and flat path
        img = (rng.uniform(0, 1, size=(4, w, 3)) ** 2 * 100).astype(
            np.float32)
        img[0, :2] = 0.0                   # zero-pixel (exponent 0) case
        img[1, :] = 7.25                   # constant row -> long RLE runs
        path = str(tmp_path / f"t{w}.hdr")
        write_hdr(path, img)
        back = read_hdr(path)
        # 8-bit mantissa shared across channels: error bound is relative
        # to the pixel's MAX channel, not each channel
        tol = img.max(-1, keepdims=True) / 256 + 1e-30
        assert np.all(np.abs(back - img) <= tol)


def test_exr_zip_and_half_read(tmp_path):
    """read_exr handles ZIPS-compressed and half-float scanline files (the
    reference's tinyexr accepts both, util/image.cpp:105-260)."""
    import struct
    import zlib

    from elaina_tpu.output.image_io import _attr

    rng = np.random.default_rng(2)
    h, w = 4, 5
    # quantized values compress well, so the zlib branch is actually taken
    # (OpenEXR stores blocks raw when compression expands them)
    img = (rng.integers(0, 4, size=(h, w, 3)) * 0.25).astype(np.float32)
    half = img.astype(np.float16)

    def build(path, pixeltype, compression):
        names = ["B", "G", "R"]  # alphabetical file order
        src = {"R": 0, "G": 1, "B": 2}
        bpp = 2 if pixeltype == 1 else 4
        chan_payload = b""
        for nm in names:
            chan_payload += nm.encode() + b"\x00" + struct.pack(
                "<iiii", pixeltype, 0, 1, 1)
        chan_payload += b"\x00"
        header = _attr("channels", "chlist", chan_payload)
        header += _attr("compression", "compression",
                        bytes([compression]))
        box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
        header += _attr("dataWindow", "box2i", box)
        header += _attr("displayWindow", "box2i", box)
        header += _attr("lineOrder", "lineOrder", b"\x00")
        header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        header += _attr("screenWindowCenter", "v2f",
                        struct.pack("<ff", 0.0, 0.0))
        header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        header += b"\x00"
        blocks = []
        for y in range(h):
            data = (half if bpp == 2 else img)
            raw = b"".join(
                np.ascontiguousarray(data[y, :, src[nm]]).tobytes()
                for nm in names)
            if compression == 2:  # ZIPS: interleave-split + delta + zlib
                a = np.frombuffer(raw, np.uint8)
                nhalf = (len(a) + 1) // 2
                planar = np.concatenate([a[0::2], a[1::2]])
                d = planar.astype(np.int16)
                d[1:] = (d[1:] - d[:-1] + 128) & 0xFF
                assert planar[:nhalf].shape[0] == nhalf
                comp = zlib.compress(d.astype(np.uint8).tobytes())
                if len(comp) >= len(raw):  # OpenEXR raw fallback
                    comp = raw
                blocks.append(struct.pack("<ii", y, len(comp)) + comp)
            else:
                blocks.append(struct.pack("<ii", y, len(raw)) + raw)
        with open(path, "wb") as f:
            f.write(struct.pack("<II", 0x01312F76, 2))
            f.write(header)
            start = 8 + len(header) + 8 * h
            offs = []
            o = start
            for b in blocks:
                offs.append(o)
                o += len(b)
            f.write(struct.pack(f"<{h}Q", *offs))
            for b in blocks:
                f.write(b)

    p1 = str(tmp_path / "zips.exr")
    build(p1, pixeltype=2, compression=2)
    np.testing.assert_allclose(read_exr(p1), img, atol=1e-6)

    p2 = str(tmp_path / "half.exr")
    build(p2, pixeltype=1, compression=0)
    np.testing.assert_allclose(read_exr(p2), half.astype(np.float32),
                               atol=1e-6)


def test_tonemaps():
    rgb = np.linspace(0, 1, 64).reshape(8, 8, 1).repeat(3, -1).astype(np.float32)
    for tone in ("NONE", "NONE_NORMALIZED", "MATLAB_JET", "MATLAB_PARULA",
                 "IDL_RDBU"):
        out = apply_tone(rgb, tone)
        assert out.shape == (8, 8, 3)
        assert np.isfinite(out).all()
    jet = apply_tone(rgb, "MATLAB_JET")
    assert jet[0, 0, 2] > 0.4 and jet[0, 0, 0] < 0.1   # low -> blue
    assert jet[-1, -1, 0] > 0.4 and jet[-1, -1, 2] < 0.1  # high -> red
    with pytest.raises(ValueError):
        apply_tone(rgb, "NOPE")


def test_ema_modes():
    e = Ema(mode=Ema.STEP, half_life=1.0)
    e.update(1.0)
    v = e.update(0.0)
    assert v == pytest.approx(0.5)
    t = Ema(mode=Ema.TIME, half_life=1e9)
    t.update(2.0)
    assert t.update(0.0) == pytest.approx(2.0, abs=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    from elaina_tpu.core.checkpoint import (
        load_solve_state, load_trainer, save_solve_state, save_trainer)
    from elaina_tpu.nn.network import init_trainer, make_network
    from elaina_tpu.solver.distributions import n_dim_output

    spec = make_network(2, n_dim_output(2), {
        "encoding": {"base_resolution": 4, "n_levels": 2,
                     "n_features_per_level": 2}})
    tr = init_trainer(jax.random.PRNGKey(0), spec)
    path = str(tmp_path / "ckpt.npz")
    save_trainer(path, tr, extra={"spp": 17})
    tr2, extra = load_trainer(path)
    assert extra == {"spp": 17}
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sol = jnp.ones((16, 3)) * 2.5
    save_solve_state(str(tmp_path / "s.npz"), sol, 9, {"k": 1})
    sol2, spp, ex = load_solve_state(str(tmp_path / "s.npz"))
    np.testing.assert_array_equal(np.asarray(sol2), np.asarray(sol))
    assert spp == 9 and ex == {"k": 1}


def test_debug_trace_walk():
    from elaina_tpu.core.problem import Boundary
    from elaina_tpu.geometry.geomset import make_geom_set
    from elaina_tpu.solver.debug import trace_walk
    from tests.test_wost_uniform import _colors_from_fn, _scene, _square_boundary

    verts, idx = _square_boundary(n_per_side=4)
    gs, _ = make_geom_set(verts, idx)
    scene = _scene(dirichlet=Boundary(
        gs=gs, colors=jnp.asarray(_colors_from_fn(verts, lambda v: 1.0))))
    trace = trace_walk(scene, [0.0, 0.0], eps=0.05, max_depth=32)
    assert len(trace) >= 1
    assert trace[0]["pos"] == [0.0, 0.0]
    # the walk eventually terminates in the epsilon shell with contribution 1
    assert not trace[-1]["active"]
    total = sum(t["contribution"][0] for t in trace)
    assert total == pytest.approx(1.0, abs=1e-4)


def test_vmf_beta_kernel():
    from elaina_tpu.solver.distributions import vmf_beta_pdf, vmf_beta_sample

    key = jax.random.PRNGKey(0)
    mu = jnp.tile(jnp.asarray([1.0, 0.0]), (20_000, 1))
    kappa = jnp.full((20_000,), 2.0)
    d, r = vmf_beta_sample(key, kappa, mu, jnp.full((20_000,), 2.0),
                           jnp.full((20_000,), 5.0), 2)
    assert float(jnp.abs(jnp.linalg.norm(d, axis=-1) - 1).max()) < 1e-4
    assert float(r.min()) >= 0 and float(r.max()) <= 1
    assert float(r.mean()) == pytest.approx(2 / 7, abs=0.01)
    p = vmf_beta_pdf(d[:4], r[:4], kappa[:4], mu[:4], jnp.full((4,), 2.0),
                     jnp.full((4,), 5.0), 2)
    assert bool(jnp.isfinite(p).all()) and bool((p >= 0).all())
