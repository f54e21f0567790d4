"""Run-to-run reproducibility knobs (VERDICT r4 #1).

``ELAINA_SEED=<int>`` offsets every integrator-level PRNG root, so
repeated runs of the same protocol draw independent sample streams
(multi-seed variance studies).  Seed 0 (the default) reproduces the
historical key layout exactly.

``ELAINA_DETERMINISTIC=1`` pins the solve's ROUND STRUCTURE: persistent
load-balancing hints from earlier processes are ignored
(core/problem.py hint cache) and the timing-fed watchdog iteration caps
are replaced by static bounds, so two runs of the same protocol at the
same seed execute the same dispatch sequence — and therefore identical
RNG streams, because the per-step keys fold the dispatch-local
iteration counter (solver/wost.py make_balanced_chunk).  Without it,
wall-clock noise feeds the iteration caps, which reshapes rounds, which
reshuffles every downstream sample and the guide's training data.

The reference has no analogous pinning: its per-pixel PCG streams are
seeded per sample (util/rng.h) but its training batch order follows the
atomic-queue commit order, which is nondeterministic by construction.
"""

from __future__ import annotations

import os

import jax


def deterministic() -> bool:
    return os.environ.get("ELAINA_DETERMINISTIC") == "1"


def pkey(i: int):
    """Integrator-level PRNG root ``i``, offset by ``ELAINA_SEED``."""
    k = jax.random.PRNGKey(i)
    seed = int(os.environ.get("ELAINA_SEED", "0") or 0)
    return jax.random.fold_in(k, seed) if seed else k
