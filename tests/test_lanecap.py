"""Lane-width cap (wost.lane_cap, VERDICT r4 #4).

Past the SMEM compaction gate (~384k lanes) the balanced solve caps its
worklist width and queues multiple pixels per lane instead.  These tests
force a tiny cap so the multi-pixel-per-lane path runs on CPU: the solve
must still complete every declared sample and agree with the uncapped
solve in expectation.
"""

import os

import numpy as np
import pytest


def _settings(spp, train=0):
    from elaina_tpu.core.config import IntegratorSettings

    return IntegratorSettings(
        frameSize=(16, 16), samplesPerPixel=spp, maxWalkingDepth=24,
        epsilonShell=1.0, trainSppCount=train,
        uniformFractionInTrainingPhase=0.5,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=6, maxGuidedDepthInGuidingPhase=6)


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


def test_lane_cap_width():
    from elaina_tpu.solver.wost import lane_cap

    os.environ["ELAINA_LANE_CAP"] = "100"
    try:
        assert lane_cap(64) == 64
        assert lane_cap(101) == 100
        assert lane_cap(101, lane_multiple=8) == 96
        os.environ["ELAINA_LANE_CAP"] = "0"
        assert lane_cap(10**7) == 10**7
    finally:
        del os.environ["ELAINA_LANE_CAP"]


@pytest.mark.parametrize("kind", ["uniform", "guided"])
def test_capped_solve_matches_uncapped(kind, monkeypatch, tmp_path):
    from bench import _build_square_problem
    from elaina_tpu.solver.guided import GuidedIntegrator
    from elaina_tpu.solver.integrator import UniformIntegrator

    monkeypatch.setenv("ELAINA_DETERMINISTIC", "1")
    monkeypatch.setenv("ELAINA_LANE_TARGET", "1")  # no oversubscription

    def solve(cap):
        monkeypatch.setenv("ELAINA_LANE_CAP", str(cap))
        p = _build_square_problem(16, "grid")
        cls = GuidedIntegrator if kind == "guided" else UniformIntegrator
        integ = cls(p, _settings(24, 8 if kind == "guided" else 0),
                    str(tmp_path / f"{kind}{cap}"))
        if kind == "guided":
            integ.reset_network(NET)
        integ.solve()
        return integ.films["SOLUTION"].pixels()

    a = solve(0)       # uncapped: one lane per pixel
    b = solve(64)      # 64 lanes for 256 pixels: 4 pixels per lane
    assert np.isfinite(b).all()
    # same estimator, different RNG streams: agree in expectation
    rel = float(np.mean(np.abs(a - b)) / max(float(np.mean(np.abs(a))), 1e-9))
    assert rel < 0.35, rel
