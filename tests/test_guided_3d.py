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
