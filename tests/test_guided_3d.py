"""Guided integrator in 3D: runs, stays finite, trains (smoke-level)."""

import jax
import jax.numpy as jnp
import numpy as np

from elaina_tpu.core.problem import Boundary
from elaina_tpu.geometry.geomset import make_geom_set
from elaina_tpu.nn.network import AdamConfig, init_trainer, make_network
from elaina_tpu.solver.distributions import n_dim_output
from elaina_tpu.solver.guided import run_one_guided_sample, train_on_records
from tests.test_wost_3d import _colors_from_fn, _cube_boundary, _scene3


def test_guided_3d_runs_and_trains():
    verts, tris = _cube_boundary(n=2)
    gs, _ = make_geom_set(verts, tris)
    colors = _colors_from_fn(verts, lambda v: (v[0] + 1.0) / 2.0)
    scene = _scene3(dirichlet=Boundary(gs=gs, colors=jnp.asarray(colors)))

    spec = make_network(3, n_dim_output(3), {
        "encoding": {"base_resolution": 4, "n_levels": 2,
                     "n_features_per_level": 2, "per_level_scale": 1.5},
        "network": {"n_neurons": 16, "n_hidden_layers": 1}})
    trainer = init_trainer(jax.random.PRNGKey(42), spec)
    cfg = AdamConfig()

    pts = jnp.asarray(np.random.default_rng(0).uniform(-0.7, 0.7, (32, 3)),
                      jnp.float32)
    mask = jnp.ones((32,), bool)

    total = jnp.zeros((32, 3))
    for s in range(8):
        contrib, records, steps = run_one_guided_sample(
            scene, spec, trainer.ema_params, pts, mask,
            jax.random.fold_in(jax.random.PRNGKey(1), s), jnp.bool_(True),
            jnp.bool_(True), jnp.float32(0.5), jnp.int32(10),
            eps=0.05, max_depth=12)
        total = total + contrib
        trainer, metric = train_on_records(
            trainer, spec, cfg, scene, records, batch_size=64, n_batches=1)
        assert bool(jnp.isfinite(metric))
    u = np.asarray(total / 8)
    assert np.isfinite(u).all()
    # crude unbiasedness: average over lanes tracks the average of the
    # analytic solution (u = (x+1)/2 -> mean over symmetric points ~ 0.5)
    assert abs(u[:, 0].mean() - 0.5) < 0.12


def test_triplane_encoding_properties():
    """3D dense levels lower to the factorized tri-plane form: bilinear
    partition-of-unity per plane (constant table -> constant output),
    exact plane separability, and matmul gradients."""
    from elaina_tpu.nn.encoding import (grid_encode, init_grid_params,
                                        make_grid_encoding)

    spec = make_grid_encoding(3, {"otype": "DenseGrid", "base_resolution": 4,
                                  "n_levels": 3, "n_features_per_level": 2,
                                  "per_level_scale": 1.5})
    assert spec.triplane
    assert spec.level_sizes[0] == 3 * 25          # 3 planes of (4+1)^2

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (64, 3)),
                    jnp.float32)
    # partition of unity: all-ones table -> every feature == 3 (one per plane)
    ones = jnp.ones((spec.n_params, spec.n_features))
    np.testing.assert_allclose(np.asarray(grid_encode(spec, ones, x)), 3.0,
                               rtol=1e-5)

    # separability: zeroing the yz/xz planes leaves a function of (x, y)
    table = init_grid_params(jax.random.PRNGKey(1), spec, scale=1.0)
    t2 = table
    for lvl in range(spec.n_levels):
        V = spec.resolutions[lvl] + 1
        off = spec.offsets[lvl]
        t2 = t2.at[off + V * V: off + 3 * V * V].set(0.0)
    xa = x
    xb = x.at[:, 2].set(jnp.mod(x[:, 2] + 0.37, 1.0))   # change z only
    fa = np.asarray(grid_encode(spec, t2, xa))
    fb = np.asarray(grid_encode(spec, t2, xb))
    np.testing.assert_allclose(fa, fb, rtol=1e-4, atol=1e-5)

    # gradients flow to every plane
    g = jax.grad(lambda t: jnp.sum(grid_encode(spec, t, x) ** 2))(table)
    for lvl in range(spec.n_levels):
        V = spec.resolutions[lvl] + 1
        off = spec.offsets[lvl]
        for pi in range(3):
            seg = g[off + pi * V * V: off + (pi + 1) * V * V]
            assert float(jnp.abs(seg).max()) > 0.0
