#!/usr/bin/env python
"""Diagnose the bimodal training outcome (round-5 seed study).

Equal-spp guided quality on spot is bimodal over seeds: ~0.76 (guide
locked onto the bright arc) vs ~1.0 (guide par with uniform).  This
runs the training phase only (trainSppCount spp of a guided solve) for
a list of seeds under pinned structure and dumps, per seed:
  - the loss history (per-round KL metric)
  - selection probability + mixture stats at probe points between the
    domain interior and the bright arc
A "bad" seed should show either a high loss plateau (optimization
failure) or healthy loss with misdirected mixtures / collapsed
selection prob (objective failure) — different fixes.

Usage: python tools/tpu_seed_diag.py [--seeds 0,1] [--res 256]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
os.environ["ELAINA_DETERMINISTIC"] = "1"
import jax

from elaina_tpu.exec import _apply_platform_env

_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--train", type=int, default=64)
    ap.add_argument("--out", default="/tmp/seed_diag.json")
    a = ap.parse_args()

    from bench import _build_ladybug_problem
    from elaina_tpu.core.config import IntegratorSettings
    from elaina_tpu.nn.network import apply_network
    from elaina_tpu.solver.distributions import (vmm_from_raw,
                                                 vmm_selection_prob)
    from elaina_tpu.solver.guided import GuidedIntegrator, normalize_coord
    from tools.tpu_parity import _respot_colors

    res = a.res
    problem = _respot_colors(_build_ladybug_problem(res, "grid"))
    # bright arc location: vertex range [0.35V, 0.35V + max(4, 0.01V))
    gs = problem.scene.dirichlet.gs
    V = gs.verts.shape[0]
    arc = np.asarray(gs.verts[int(0.36 * V)])
    print(f"bright arc at {arc}", flush=True)

    settings = IntegratorSettings(
        frameSize=(res, res), samplesPerPixel=a.spp, maxWalkingDepth=64,
        epsilonShell=1.0, trainSppCount=a.train,
        uniformFractionInTrainingPhase=0.5,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=10, maxGuidedDepthInGuidingPhase=10)
    net = {
        "encoding": {"otype": "DenseGrid", "base_resolution": 8,
                     "n_levels": 8, "n_features_per_level": 4,
                     "per_level_scale": 1.405},
        "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                    "n_hidden_layers": 3, "activation": "ReLU"},
        "optimizer": {"otype": "Ema", "decay": 0.95,
                      "nested": {"otype": "Adam", "learning_rate": 8e-3,
                                 "beta1": 0.9, "beta2": 0.99,
                                 "epsilon": 1e-15, "l2_reg": 1e-6}},
    }

    # probe points: on the segment from the domain center toward the arc
    center = np.array([250.0, 250.0], np.float32)
    probes = np.stack([center + t * (arc - center)
                       for t in (0.3, 0.5, 0.7, 0.85)]).astype(np.float32)

    out = {"arc": arc.tolist(), "probes": probes.tolist(), "seeds": {}}
    for seed in [int(s) for s in a.seeds.split(",")]:
        os.environ["ELAINA_SEED"] = str(seed)
        integ = GuidedIntegrator(problem, settings, "/tmp/seed_diag")
        integ.reset_network(net)
        integ.prepare()
        # run ONLY the training phase: set samplesPerPixel == trainSppCount
        # is invalid (guiding phase no-op), so run the full solve but we
        # only need the trained net + loss curve; use the training spp as
        # the whole budget to keep it cheap
        import dataclasses
        s2 = dataclasses.replace(settings, samplesPerPixel=a.train + 1)
        integ.settings = s2
        integ.solve()
        scene = problem.scene
        x = normalize_coord(jnp.asarray(probes), scene.aabb_lo,
                            scene.aabb_hi)
        raw = apply_network(integ.spec, integ.trainer.ema_params, x)
        vmm = vmm_from_raw(raw, 2)
        sp = vmm_selection_prob(raw, 2)
        # mixture mass pointing toward the arc (cosine > 0.8 with the
        # direction probe->arc), weighted by lambda
        to_arc = arc[None, :] - probes
        to_arc = to_arc / np.linalg.norm(to_arc, axis=-1, keepdims=True)
        mu = np.asarray(vmm.mu)          # (P, K, 2)
        lam = np.asarray(vmm.lam)        # (P, K)
        kap = np.asarray(vmm.kappa)
        cos = np.sum(mu * to_arc[:, None, :], -1)
        mass_to_arc = (lam * (cos > 0.8)).sum(-1) / np.maximum(
            lam.sum(-1), 1e-9)
        rec = {
            "loss_first5": [float(v) for v in integ.loss_history[:5]],
            "loss_last5": [float(v) for v in integ.loss_history[-5:]],
            "loss_min": float(np.min(integ.loss_history)),
            "loss_final_mean": float(np.mean(integ.loss_history[-3:])),
            "selection_prob": np.asarray(sp).tolist(),
            "mass_to_arc": mass_to_arc.tolist(),
            "kappa_mean": kap.mean(-1).tolist(),
            "lam_max": lam.max(-1).tolist(),
        }
        out["seeds"][seed] = rec
        print(f"seed {seed}: {json.dumps(rec)}", flush=True)

    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
