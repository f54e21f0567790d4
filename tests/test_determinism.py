"""Pinned-round-structure reproducibility (VERDICT r4 #1).

``ELAINA_DETERMINISTIC=1`` must make an unbudgeted solve bit-reproducible
run-to-run: no disk hints, no timing-fed iteration caps, so the dispatch
sequence — and with it every folded RNG stream — is identical.
``ELAINA_SEED`` must rotate the sample streams (multi-seed studies).

The reference cannot pin its training order (atomic-queue commit order,
guided/integrator.cu record queues); this mode is how the repo's parity
protocol separates seed spread from code regressions.
"""

import os

import numpy as np
import pytest

NET = {
    "encoding": {"otype": "DenseGrid", "base_resolution": 4, "n_levels": 2,
                 "n_features_per_level": 2, "per_level_scale": 2.0},
    "network": {"otype": "FullyFusedMLP", "n_neurons": 16,
                "n_hidden_layers": 2, "activation": "ReLU"},
    "optimizer": {"otype": "Ema", "decay": 0.95,
                  "nested": {"otype": "Adam", "learning_rate": 8e-3,
                             "beta1": 0.9, "beta2": 0.99,
                             "epsilon": 1e-15, "l2_reg": 1e-6}},
}


def _solve_once(kind: str, tmp: str):
    from bench import _build_square_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator
    from elaina_tpu.solver.integrator import UniformIntegrator

    problem = _build_square_problem(16, "grid")
    settings = IntegratorSettings(
        frameSize=(16, 16), samplesPerPixel=24, maxWalkingDepth=24,
        epsilonShell=1.0, trainSppCount=8,
        uniformFractionInTrainingPhase=0.5,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=6, maxGuidedDepthInGuidingPhase=6)
    cls = GuidedIntegrator if kind == "guided" else UniformIntegrator
    integ = cls(problem, settings, tmp)
    if kind == "guided":
        integ.reset_network(NET)
    integ.solve()
    return integ.films["SOLUTION"].pixels()


@pytest.mark.parametrize("kind", ["uniform", "guided"])
def test_deterministic_mode_is_bit_reproducible(kind, monkeypatch, tmp_path):
    monkeypatch.setenv("ELAINA_DETERMINISTIC", "1")
    monkeypatch.setenv("ELAINA_SEED", "0")
    a = _solve_once(kind, str(tmp_path / "a"))
    b = _solve_once(kind, str(tmp_path / "b"))
    np.testing.assert_array_equal(a, b)


def test_seed_rotates_sample_streams(monkeypatch, tmp_path):
    monkeypatch.setenv("ELAINA_DETERMINISTIC", "1")
    monkeypatch.setenv("ELAINA_SEED", "0")
    a = _solve_once("uniform", str(tmp_path / "a"))
    monkeypatch.setenv("ELAINA_SEED", "1")
    b = _solve_once("uniform", str(tmp_path / "b"))
    # different streams, same estimator: images differ but agree in
    # expectation (loose tolerance at 24 spp)
    assert np.any(a != b)
    assert float(np.mean(np.abs(a - b))) < 0.35 * max(
        float(np.mean(np.abs(a))), 1e-6) + 0.05
