"""Sharded persistent solves: the balanced-worklist chunk distributed over
a device mesh (wost.make_balanced_chunk(mesh=...)).

The reference is single-GPU (SURVEY.md §2.2); this is the TPU-native
scale-out axis: lanes shard, every device drains its OWN worklist loop
(no per-iteration cross-chip sync), scene and network replicate.
Runs on the 8-virtual-device CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elaina_tpu.core.config import IntegratorSettings
from elaina_tpu.parallel.dp import make_mesh
from elaina_tpu.solver.guided import GuidedIntegrator
from elaina_tpu.solver.integrator import UniformIntegrator

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _problem(res):
    from bench import _build_square_problem

    return _build_square_problem(res, "grid")


def test_sharded_uniform_solve_matches_analytic():
    """The mesh-sharded balanced solve is unbiased: 16x16 frame (256 lanes
    = 32/device), harmonic u=(x+1)/2 boundary colors."""
    res = 16
    problem = _problem(res)
    settings = IntegratorSettings(
        frameSize=(res, res), samplesPerPixel=48, maxWalkingDepth=32,
        epsilonShell=1.0)

    single = UniformIntegrator(problem, settings, "/tmp/psolve_1")
    single.solve()
    ref = np.asarray(single.films["SOLUTION"].pixels())

    sharded = UniformIntegrator(problem, settings, "/tmp/psolve_8")
    sharded.mesh = make_mesh(8)
    sharded.solve()
    img = np.asarray(sharded.films["SOLUTION"].pixels())

    assert np.isfinite(img).all()
    # same estimator, different RNG streams: means agree within MC noise
    assert abs(img.mean() - ref.mean()) < 0.08 * max(abs(ref.mean()), 1e-3)
    # per-shard RNG decorrelation: shards must not produce identical rows
    rows = img.reshape(8, -1)
    assert not np.allclose(rows[0], rows[1])


def test_sharded_guided_guiding_phase():
    """Guided solve with the GUIDING phase sharded over the mesh (training
    phase stays single-program — its in-loop optimizer cannot sit inside
    shard-divergent while_loops)."""
    res = 16
    problem = _problem(res)
    settings = IntegratorSettings(
        frameSize=(res, res), samplesPerPixel=24, maxWalkingDepth=32,
        epsilonShell=1.0, trainSppCount=8,
        uniformFractionInTrainingPhase=0.5,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=6, maxGuidedDepthInGuidingPhase=6)
    net = {"encoding": {"base_resolution": 4, "n_levels": 2,
                        "n_features_per_level": 2, "per_level_scale": 1.5},
           "network": {"n_neurons": 16, "n_hidden_layers": 1}}

    single = GuidedIntegrator(problem, settings, "/tmp/psolve_g1")
    single.reset_network(net)
    single.solve()
    ref = np.asarray(single.films["SOLUTION"].pixels())

    sharded = GuidedIntegrator(problem, settings, "/tmp/psolve_g8")
    sharded.mesh = make_mesh(8)
    sharded.reset_network(net)
    sharded.solve()
    img = np.asarray(sharded.films["SOLUTION"].pixels())

    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) < 0.12 * max(abs(ref.mean()), 1e-3)
