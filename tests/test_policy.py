"""Budget-policy DECISION tests (VERDICT r3 next #6).

The equal-time machinery is policy-heavy (skip-training knee, share
caps, proportional round quotas, min-dispatch stop).  These tests pin
the decisions themselves — not just "runs without error" — so a
different scene/budget mix can't silently land in the undertrained
"actively mediocre guide" zone.  Policy spec: the paper's equal-time
protocol (reference integrator/uniform/integrator.cu:594-609) with the
constants derived in solver/guided.py (measured variance ratios).
"""

import time

import numpy as np
import pytest

from elaina_tpu.solver.guided import (
    TRAIN_KNEE_SPP,
    TRAIN_SHARE_DEEP,
    TRAIN_SHARE_SHALLOW,
    TRAIN_SPP_TARGET,
    budget_train_policy,
)
from elaina_tpu.solver.wost import BudgetSlicer

NET = {"encoding": {"base_resolution": 4, "n_levels": 2,
                    "n_features_per_level": 2, "per_level_scale": 1.5},
       "network": {"n_neurons": 16, "n_hidden_layers": 1},
       "optimizer": {"otype": "Ema", "decay": 0.95,
                     "nested": {"otype": "Adam", "learning_rate": 8e-3}}}


# --------------------------------------------------------------------------- #
# budget_train_policy (pure)
# --------------------------------------------------------------------------- #


def test_train_policy_skip_iff_wall_blows_share():
    B = 10.0
    # deep target (>= knee): share cap TRAIN_SHARE_DEEP
    skip, t, cap = budget_train_policy(64, B, predicted_wall=0.99 * cap_s(B))
    assert not skip and t == TRAIN_SPP_TARGET and cap == TRAIN_SHARE_DEEP
    skip, _, _ = budget_train_policy(64, B, predicted_wall=1.01 * cap_s(B))
    assert skip
    # shallow target (< knee): the small share cap
    bs = TRAIN_SHARE_SHALLOW * B
    skip, t, cap = budget_train_policy(16, B, predicted_wall=0.99 * bs)
    assert not skip and t == 16 and cap == TRAIN_SHARE_SHALLOW
    skip, _, _ = budget_train_policy(16, B, predicted_wall=1.01 * bs)
    assert skip


def cap_s(budget):
    return TRAIN_SHARE_DEEP * budget


def test_train_policy_no_hints_starts_training():
    # without a wall prediction the phase must START (the slicer then
    # cuts it at the share cap) — skipping would forfeit the variance win
    skip, t, cap = budget_train_policy(64, 10.0, predicted_wall=None)
    assert not skip


def test_train_policy_target_bounds():
    # target is the measured knee, never more than trainSppCount
    assert budget_train_policy(8, 10.0, None)[1] == 8
    assert budget_train_policy(1000, 10.0, None)[1] == TRAIN_SPP_TARGET
    # the knee constant sits between the shallow and deep regimes
    assert 0 < TRAIN_KNEE_SPP <= TRAIN_SPP_TARGET
    assert TRAIN_SHARE_SHALLOW < TRAIN_SHARE_DEEP < 1.0


# --------------------------------------------------------------------------- #
# BudgetSlicer decisions (pure numpy; time controlled via start_time)
# --------------------------------------------------------------------------- #


def test_slicer_without_budget_passes_quotas_through():
    sl = BudgetSlicer(None, time.time())
    rem = np.array([7, 3, 0, 11], np.int64)
    out, stop = sl.plan(rem, np.ones(4), 0, 4, True)
    assert not stop and np.array_equal(out, rem)


def test_slicer_rateless_round_is_a_minimal_probe():
    sl = BudgetSlicer(10.0, time.time())
    rem = np.full(16, 50, np.int64)
    out, stop = sl.plan(rem, np.ones(16), 0, probe_spp=4, have_cost=False)
    assert not stop
    assert out.max() <= 2          # unbounded-wall probe stays minimal


def test_slicer_proportional_quotas_cover_half_budget():
    # rate known, cost known: the round quota is the SAME fraction of
    # every pixel's remaining samples (ceil'd), sized ~1.3x the step
    # capacity of half the remaining budget
    rate = 1000.0
    sl = BudgetSlicer(10.0, time.time(), rate0=rate)
    rng = np.random.default_rng(5)
    rem = rng.integers(5, 60, 256).astype(np.int64)
    cost = rng.uniform(2, 10, 256)
    out, stop = sl.plan(rem, cost, 1, 4, True)
    assert not stop
    cap_steps = 0.5 * 10.0 * rate
    total = float((rem * np.maximum(cost, 1.0)).sum())
    frac = 1.3 * cap_steps / total
    assert total > cap_steps       # the test must exercise the cut branch
    np.testing.assert_array_equal(out, np.minimum(rem, np.ceil(rem * frac)))
    # every unresolved pixel progresses
    assert np.all(out[rem > 0] >= 1)


def test_slicer_quota_completion_stays_even():
    """Simulated budgeted run: per-pixel completion keeps harmonic/
    arithmetic mean ratio > 0.9 (the r3 fix's own metric — full quotas
    cut by the iteration cap alone measured 123/304 = 0.40)."""
    rate = 1000.0
    t0 = time.time()
    sl = BudgetSlicer(8.0, t0, rate0=rate)
    rng = np.random.default_rng(7)
    rem = rng.integers(16, 64, 512).astype(np.int64)
    goal = rem.copy()
    cost = rng.uniform(1, 12, 512)
    # walk the clock forward manually: each round consumes its planned
    # share of the budget (the slicer's own wall model)
    elapsed = 0.0
    for round_i in range(1, 40):
        sl.start = time.time() - elapsed        # pin 'now - start'
        out, stop = sl.plan(rem, cost, round_i, 4, True)
        if stop or rem.sum() == 0:
            break
        rem = rem - out
        elapsed += float((out * np.maximum(cost, 1.0)).sum()) / rate
        if elapsed >= 8.0:
            break
    done = (goal - rem).astype(np.float64)
    # the budget cut the run short (otherwise the test is vacuous)
    assert rem.sum() > 0
    assert done.min() > 0
    harm = done.size / (1.0 / done).sum()
    assert harm / done.mean() > 0.9


def test_slicer_stops_when_min_dispatch_blows_budget():
    rate = 100.0
    sl = BudgetSlicer(10.0, time.time(), rate0=rate)
    rem = np.full(8, 50, np.int64)
    # min dispatch wall = floor * n_lanes / rate = 64*1000/100 = 640s >> 20s
    out, stop = sl.plan(rem, np.ones(8), 2, 4, True,
                        n_lanes=1000, floor=64)
    assert stop
    # with a TRUSTED cross-solve prior (rate0 given to the constructor),
    # the stop applies from round 1 too: a genuinely over-budget minimum
    # dispatch must not run just because it is early (ADVICE r4 #1)
    out, stop = sl.plan(rem, np.ones(8), 1, 4, True,
                        n_lanes=1000, floor=64)
    assert stop
    # round 1 is EXEMPT only when the rate's single sample is this
    # process's own round 0, which can be compile-inflated 10-50x —
    # amplified by an oversubscribed lane width it predicted a 4000s
    # minimum dispatch for a 600s budget and aborted the solve after the
    # probe.  Round 1 then stays wall-bounded by bound_cap + watchdog.
    sl2 = BudgetSlicer(10.0, time.time())
    sl2.update(1000, 10.0)            # round-0 sample only: suspect
    out, stop = sl2.plan(rem, np.ones(8), 1, 4, True,
                         n_lanes=1000, floor=64)
    assert not stop
    out, stop = sl2.plan(rem, np.ones(8), 2, 4, True,
                         n_lanes=1000, floor=64)
    assert stop


def test_slicer_bound_cap_fits_slice():
    rate = 1000.0
    sl = BudgetSlicer(10.0, time.time(), rate0=rate)
    sl.plan(np.full(4, 1000, np.int64), np.full(4, 100.0), 1, 4, True)
    # slice_s = ~5s -> cap_t = ~5*1000/50 = ~100 iterations (wall time
    # elapses between construction and plan, so allow one-iteration slack)
    assert abs(sl.bound_cap(10_000, n_lanes=50, floor=8) - 100) <= 1
    # the floor keeps committed walks able to finish
    assert sl.bound_cap(10_000, n_lanes=10_000_000, floor=8) == 8
    # caps below the bound pass through
    assert sl.bound_cap(3, n_lanes=50, floor=1) == 3


# --------------------------------------------------------------------------- #
# e2e decisions on a tiny CPU solve
# --------------------------------------------------------------------------- #


def _tiny_guided(tmp_name, train_spp=16, spp=48):
    from bench import _build_square_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.solver.guided import GuidedIntegrator

    problem = _build_square_problem(16, "grid")
    settings = IntegratorSettings(
        frameSize=(16, 16), samplesPerPixel=spp, maxWalkingDepth=32,
        epsilonShell=1.0, trainSppCount=train_spp,
        uniformFractionInTrainingPhase=0.5,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=6, maxGuidedDepthInGuidingPhase=6)
    integ = GuidedIntegrator(problem, settings, f"/tmp/{tmp_name}")
    integ.reset_network(NET)
    return integ


def test_budgeted_training_reaches_spp_target():
    """With a generous budget the spp TARGET — not the wall — is the
    limiter: achieved train spp must hit min(TRAIN_SPP_TARGET,
    trainSppCount) (the r3 regression trained ~19 spp against 32 and
    landed in the mediocre-guide zone)."""
    integ = _tiny_guided("policy_target", train_spp=16, spp=32)
    integ.solve(time_budget_s=600.0)
    assert integ.train_spp_achieved == pytest.approx(16, abs=0.5)
    assert integ.phase_stats["train_steps"] > 0
    assert integ._net_trained


def test_budgeted_training_skipped_when_wall_blows_share(monkeypatch):
    """The solve-level skip decision fires when the predicted training
    wall exceeds its budget share — and the solve must fall back to the
    exact-uniform sampler (untrained net), not an undertrained guide."""
    from elaina_tpu.solver.guided import GuidedIntegrator

    integ = _tiny_guided("policy_skip")
    monkeypatch.setattr(GuidedIntegrator, "_train_spp_wall",
                        lambda self, t: 1e9)
    integ.solve(time_budget_s=30.0)
    assert integ.phase_stats["train_steps"] == 0
    assert not integ._net_trained
    img = np.asarray(integ.films["SOLUTION"].pixels())
    assert np.isfinite(img).all()
