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


def test_sharded_chunk_rng_decorrelated():
    """Per-shard RNG streams must differ: give every shard an IDENTICAL
    worklist (same pixels, same quotas) — with correlated streams each
    shard would execute identical walks and report identical per-lane
    step counts."""
    import jax.numpy as jnp

    from elaina_tpu.solver.wost import (N_PIECES, compute_step0,
                                        make_balanced_chunk)

    problem = _problem(16)
    scene = problem.scene
    pts16 = np.asarray(
        UniformIntegrator(problem, IntegratorSettings(
            frameSize=(16, 16), samplesPerPixel=1, maxWalkingDepth=16,
            epsilonShell=1.0), "/tmp/psolve_rng").eval_points)[:32]
    pts = np.tile(pts16, (8, 1))                     # identical per shard
    n = pts.shape[0]
    rd0, _, _ = compute_step0(scene, jnp.asarray(pts),
                              jnp.ones((n,), bool), eps=1.0,
                              d_stack=problem.d_stack,
                              n_stack=problem.n_stack)

    S = N_PIECES
    piece_pos = tuple(
        jnp.tile(jnp.asarray(pts[:, d])[None], (S, 1)) for d in range(2))
    piece_rd0 = jnp.tile(jnp.asarray(rd0)[None], (S, 1))
    quota = jnp.zeros((S, n), jnp.int32).at[0].set(2)

    chunk = make_balanced_chunk(
        None, eps=1.0, max_depth=16, d_stack=problem.d_stack,
        n_stack=problem.n_stack, mesh=make_mesh(8))
    _, _, lsteps, steps, _ = chunk(scene, None, piece_pos, piece_rd0,
                                   quota, jax.random.PRNGKey(0),
                                   jnp.int32(64))
    rows = np.asarray(lsteps).reshape(8, 32)
    assert int(steps) > 0
    # identical worklists, so any row inequality is purely RNG-driven
    assert any(not np.array_equal(rows[0], rows[i]) for i in range(1, 8))


def test_sharded_guided_guiding_phase():
    """Full guided solve with BOTH phases sharded over the mesh: the
    guiding phase drains per-device worklists independently; the training
    phase runs LOCKSTEP while_loops (psum'd termination) so its in-loop
    optimizer pmean-reduces gradients over the mesh (VERDICT r2 #6)."""
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
    # the training phase really ran sharded (walked + trained the net)
    assert sharded.phase_stats["train_steps"] > 0
    assert sharded._net_trained
    # replicated trainer copies must agree with a fully-addressable array
    for leaf in jax.tree.leaves(sharded.trainer.params):
        assert np.isfinite(np.asarray(leaf)).all()
