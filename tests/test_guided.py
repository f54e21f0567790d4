"""Guided integrator: unbiasedness vs analytic solution + training sanity
(reference behavior: guided == uniform in expectation; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.core.problem import Boundary
from elaina_tpu.geometry.geomset import make_geom_set
from elaina_tpu.nn.encoding import grid_encode, make_grid_encoding
from elaina_tpu.nn.network import AdamConfig, apply_network, init_trainer, make_network
from elaina_tpu.solver.distributions import n_dim_output
from elaina_tpu.solver.guided import (
    normalize_coord,
    run_one_guided_sample,
    train_on_records,
)
from tests.test_wost_uniform import _colors_from_fn, _scene, _square_boundary


def _mixed_scene():
    d_verts, d_idx = _square_boundary(n_per_side=6, sides=(1, 3))
    d_gs, _ = make_geom_set(d_verts, d_idx)
    d_colors = _colors_from_fn(d_verts, lambda v: (v[0] + 1) / 2)
    n_verts, n_idx = _square_boundary(n_per_side=6, sides=(0, 2))
    n_gs, _ = make_geom_set(n_verts, n_idx)
    return _scene(
        dirichlet=Boundary(gs=d_gs, colors=jnp.asarray(d_colors)),
        neumann=Boundary(gs=n_gs,
                         colors=jnp.zeros((len(n_verts), 2, 3), jnp.float32)),
    )


def test_guided_matches_analytic_with_online_training():
    """Full guided pipeline (train phase then guide phase) stays unbiased:
    MIS with the learned selection probability must reproduce u=(x+1)/2."""
    scene = _mixed_scene()
    spec = make_network(2, n_dim_output(2), {
        "encoding": {"base_resolution": 4, "n_levels": 4,
                     "n_features_per_level": 2, "per_level_scale": 1.5},
        "network": {"n_neurons": 32, "n_hidden_layers": 2},
    })
    trainer = init_trainer(jax.random.PRNGKey(42), spec)
    cfg = AdamConfig()

    pts = np.array([[0.0, 0.0], [0.5, 0.8], [-0.5, -0.8]], np.float32)
    pts_j = jnp.asarray(pts)
    mask = jnp.ones((3,), bool)

    walk = jax.jit(lambda params, k, ton, uf: run_one_guided_sample(
        scene, spec, params, pts_j, mask, k, jnp.bool_(True), ton, uf,
        jnp.int32(10), eps=0.02, max_depth=48))
    train = jax.jit(lambda tr, rec: train_on_records(
        tr, spec, cfg, scene, rec, batch_size=16, n_batches=1))

    key = jax.random.PRNGKey(3)
    total = jnp.zeros((3, 3))
    train_spp, spp = 64, 256
    losses = []
    for s in range(spp):
        training = s < train_spp
        contrib, records, _steps = walk(trainer.ema_params,
                                jax.random.fold_in(key, s),
                                jnp.bool_(training), jnp.float32(0.5))
        total = total + contrib
        if training:
            trainer, metric = train(trainer, records)
            losses.append(float(metric))
    u = np.asarray(total / spp)
    expected = (pts[:, 0] + 1.0) / 2.0
    np.testing.assert_allclose(u[:, 0], expected, atol=0.08)
    assert np.isfinite(losses).all()


def test_grid_encoding_interpolates():
    spec = make_grid_encoding(2, {"base_resolution": 4, "n_levels": 2,
                                  "n_features_per_level": 2,
                                  "per_level_scale": 2.0})
    table = jnp.ones((spec.n_params, spec.n_features))
    x = jax.random.uniform(jax.random.PRNGKey(0), (32, 2))
    out = grid_encode(spec, table, x)
    assert out.shape == (32, spec.out_dim)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_grid_encoding_separable_matches_gather():
    """The MXU tent-matmul path equals the per-corner gather path (values
    AND table gradients)."""
    from elaina_tpu.nn.encoding import (_grid_encode_2d_separable,
                                        _grid_encode_gather,
                                        init_grid_params)

    spec = make_grid_encoding(2, {"base_resolution": 5, "n_levels": 4,
                                  "n_features_per_level": 3,
                                  "per_level_scale": 1.7})
    table = init_grid_params(jax.random.PRNGKey(3), spec, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(4), (200, 2), minval=-0.1,
                           maxval=1.1)   # includes out-of-range clamping
    a = _grid_encode_2d_separable(spec, table, x)
    b = _grid_encode_gather(spec, table, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)

    ga = jax.grad(lambda t: jnp.sum(_grid_encode_2d_separable(spec, t, x)**2))(table)
    gb = jax.grad(lambda t: jnp.sum(_grid_encode_gather(spec, t, x)**2))(table)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-5)


def test_network_output_shape_and_grads():
    spec = make_network(2, n_dim_output(2), {})
    trainer = init_trainer(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
    raw = apply_network(spec, trainer.params, x)
    assert raw.shape == (64, n_dim_output(2))
    assert bool(jnp.isfinite(raw).all())

    def f(p):
        return jnp.sum(apply_network(spec, p, x) ** 2)

    g = jax.grad(f)(trainer.params)
    assert all(bool(jnp.isfinite(v).all()) for v in jax.tree.leaves(g))


def test_normalize_coord_in_unit_box():
    lo = jnp.asarray([-100.0, -100.0])
    hi = jnp.asarray([600.0, 600.0])
    p = jnp.asarray([[-100.0, -100.0], [600.0, 600.0], [250.0, 250.0]])
    x = normalize_coord(p, lo, hi)
    assert float(x.min()) > 0.0 and float(x.max()) < 1.0
    np.testing.assert_allclose(np.asarray(x[2]), 0.5, atol=1e-6)


def test_guided_integrator_time_budget():
    """A time-budgeted guided solve degrades gracefully: training capped at
    20% of the budget, guiding rounds time-sliced, image finite and close
    to the unbudgeted estimate (both are unbiased estimators of u)."""
    from bench import _build_square_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator

    problem = _build_square_problem(16, "grid")
    settings = IntegratorSettings(
        frameSize=(16, 16), samplesPerPixel=24, maxWalkingDepth=32,
        epsilonShell=1.0, trainSppCount=8,
        uniformFractionInTrainingPhase=0.5,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=6, maxGuidedDepthInGuidingPhase=6)
    net = {"encoding": {"base_resolution": 4, "n_levels": 2,
                        "n_features_per_level": 2, "per_level_scale": 1.5},
           "network": {"n_neurons": 16, "n_hidden_layers": 1},
           "optimizer": {"otype": "Ema", "decay": 0.95,
                         "nested": {"otype": "Adam", "learning_rate": 8e-3}}}

    means = []
    for budget in (None, 20.0):
        integ = GuidedIntegrator(problem, settings, "/tmp/test_guided_tb")
        integ.reset_network(net)
        integ.solve(time_budget_s=budget)
        img = np.asarray(integ.films["SOLUTION"].pixels())
        assert np.isfinite(img).all()
        means.append(float(img.mean()))
    # both estimate the same harmonic function; the budgeted one is noisier
    assert abs(means[1] - means[0]) < 0.15 * max(abs(means[0]), 1e-3)


def test_train_pixel_stride_masks_records():
    """isTrainingPixel (guided.h:101-109): with stride S and offset O, only
    lanes with (pixel - O) % S == 0 write walk records; contributions are
    unaffected (non-training pixels still walk and render)."""
    scene = _mixed_scene()
    spec = make_network(2, n_dim_output(2), {
        "encoding": {"base_resolution": 4, "n_levels": 2,
                     "n_features_per_level": 2, "per_level_scale": 1.5},
        "network": {"n_neurons": 16, "n_hidden_layers": 1},
    })
    trainer = init_trainer(jax.random.PRNGKey(42), spec)

    n = 8
    pts = jnp.stack([jnp.linspace(-0.8, 0.8, n),
                     jnp.linspace(-0.5, 0.5, n)], -1)
    mask = jnp.ones((n,), bool)
    stride, off = 3, 1
    tsel = jnp.asarray((np.arange(n) - off) % stride == 0)

    key = jax.random.PRNGKey(7)
    c_sel, rec_sel, _ = run_one_guided_sample(
        scene, spec, trainer.ema_params, pts, mask, key, jnp.bool_(True),
        jnp.bool_(True), jnp.float32(0.5), jnp.int32(6), eps=0.05,
        max_depth=16, train_sel=tsel)
    c_all, rec_all, _ = run_one_guided_sample(
        scene, spec, trainer.ema_params, pts, mask, key, jnp.bool_(True),
        jnp.bool_(True), jnp.float32(0.5), jnp.int32(6), eps=0.05,
        max_depth=16)

    cur_sel = np.asarray(rec_sel.cur)
    cur_all = np.asarray(rec_all.cur)
    sel_np = np.asarray(tsel)
    assert (cur_sel[~sel_np] == 0).all()          # masked lanes: no records
    assert (cur_sel[sel_np] == cur_all[sel_np]).all()  # selected: unchanged
    assert cur_all.sum() > 0
    # identical RNG stream -> identical walk contributions
    np.testing.assert_allclose(np.asarray(c_sel), np.asarray(c_all),
                               rtol=1e-6, atol=1e-7)

def test_untrained_net_fallback_in_phase_and_checkpoint(tmp_path):
    """ADVICE r2 #2/#3: with no optimizer step run, BOTH dispatch paths
    (persistent and chunked `_phase`) must fall back to uniform sampling
    (max_guided_depth == 0), and the trained flag must round-trip through
    checkpoints instead of being assumed True on load."""
    from bench import _build_square_problem
    from elaina_tpu.core.checkpoint import load_trainer, save_trainer
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator

    problem = _build_square_problem(8, "grid")
    settings = IntegratorSettings(
        frameSize=(8, 8), samplesPerPixel=4, maxWalkingDepth=16,
        epsilonShell=1.0, trainSppCount=0,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInGuidingPhase=6)
    net = {"encoding": {"base_resolution": 4, "n_levels": 2,
                        "n_features_per_level": 2, "per_level_scale": 1.5},
           "network": {"n_neurons": 16, "n_hidden_layers": 1}}
    integ = GuidedIntegrator(problem, settings, str(tmp_path))
    integ.reset_network(net)
    assert not integ._net_trained
    _, mgd, training = integ._phase(0)           # trainSppCount=0 -> guiding
    assert not training and int(mgd) == 0        # uniform fallback
    integ._net_trained = True
    _, mgd, _ = integ._phase(0)
    assert int(mgd) == 6                         # trained: guiding enabled

    # checkpoint round-trip of the trained flag
    ck = str(tmp_path / "ck.npz")
    save_trainer(ck, integ.trainer, {"spp": 0, "net_trained": False})
    _, meta = load_trainer(ck)
    assert meta["net_trained"] is False
    save_trainer(ck, integ.trainer, {"spp": 0, "net_trained": True})
    _, meta = load_trainer(ck)
    assert meta["net_trained"] is True
