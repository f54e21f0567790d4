#!/usr/bin/env python
"""The reference's OWN benchmark protocol, end-to-end (VERDICT r4 #3).

Reference configs (data/ladybug/{u,n,gt}.json, data/fille/{u,n,gt}.json):
1024x1024 frame, uniform 1024 spp (`u`), guided 1024 spp with 256 train
spp (`n`), ground truth uniform 65,536 spp (`gt`), maxWalkingDepth 64
(fille: 128), epsilonShell 1.  The reference publishes no timings; this
records duration, steps/s, RMSE vs GT, and the equal-spp ratio on TPU.

The GT spp is configurable because 65,536 spp at 1024^2 is ~27h on one
v5e chip; --gt-spp 8192 keeps GT error ~2.8x below the 1024-spp runs'
(inflating measured RMSE ~6%, equally for both estimators).  The GT
image is cached on disk (float32 npz) so the long run survives process
restarts and can be shared across phases.

Usage:
  python tools/tpu_refprotocol.py --phase gt  [--scene ladybug] [--gt-spp 8192]
  python tools/tpu_refprotocol.py --phase u
  python tools/tpu_refprotocol.py --phase n
  python tools/tpu_refprotocol.py --phase report
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import jax

from elaina_tpu.exec import _apply_platform_env

_apply_platform_env()
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np

RES = 1024
OUT = "/root/repo/BENCH_refprotocol.json"
CACHE = "/root/repo/.cache/refprotocol"


def _build(scene: str):
    from bench import _build_ladybug_problem
    from elaina_tpu.core.problem import Problem

    if scene == "ladybug":
        return _build_ladybug_problem(RES, "grid"), 64
    # fille: the reference's second shipped scene (66k segments, depth 128)
    conf = json.load(open(f"/root/repo/configs/fille_u.json"))["scene"]
    return Problem(2, verbose=False).load_config(
        conf, cache_dir="/root/repo/.cache", accel="grid"), 128


def _settings(spp, depth, train=0):
    from elaina_tpu.core.config import IntegratorSettings

    return IntegratorSettings(
        frameSize=(RES, RES), samplesPerPixel=spp, maxWalkingDepth=depth,
        epsilonShell=1.0, trainSppCount=train,
        uniformFractionInTrainingPhase=0.5,
        uniformFractionInGuidingPhase=0.5,
        maxGuidedDepthInTrainingPhase=10, maxGuidedDepthInGuidingPhase=10)


NET = {  # reference data/ladybug/n.json network block
    "encoding": {"otype": "DenseGrid", "base_resolution": 8, "n_levels": 8,
                 "n_features_per_level": 4, "per_level_scale": 1.405},
    "network": {"otype": "FullyFusedMLP", "n_neurons": 64,
                "n_hidden_layers": 3, "activation": "ReLU"},
    "optimizer": {"otype": "Ema", "decay": 0.95,
                  "nested": {"otype": "Adam", "learning_rate": 8e-3,
                             "beta1": 0.9, "beta2": 0.99,
                             "epsilon": 1e-15, "l2_reg": 1e-6}},
}
NET_FILLE = dict(NET, encoding={  # data/fille/n.json: 4 levels from base 4
    "otype": "DenseGrid", "base_resolution": 4, "n_levels": 4,
    "n_features_per_level": 4, "per_level_scale": 1.405})


def _merge(path, key, row):
    data = {}
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data.setdefault(key, {}).update(row)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({key: row}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["gt", "u", "n", "rescore", "report"])
    ap.add_argument("--scene", default="ladybug",
                    choices=["ladybug", "fille"])
    ap.add_argument("--gt-spp", type=int, default=8192)
    a = ap.parse_args()
    os.makedirs(CACHE, exist_ok=True)
    gt_path = os.path.join(CACHE, f"{a.scene}_gt.npz")
    key = a.scene

    from elaina_tpu.solver.guided import GuidedIntegrator
    from elaina_tpu.solver.integrator import UniformIntegrator
    from tools.rmse import rmse

    if a.phase == "report":
        data = json.load(open(OUT))
        print(json.dumps(data, indent=1))
        return

    if a.phase == "rescore":
        # recompute RMSE for u/n images cached before the GT finished
        gt = np.load(gt_path)["img"]
        data = json.load(open(OUT))
        for ph, name in (("uniform", "u"), ("guided", "n")):
            p = os.path.join(CACHE, f"{a.scene}_{name}.npz")
            if os.path.exists(p) and ph in data.get(key, {}):
                data[key][ph]["rmse"] = rmse(np.load(p)["img"], gt)
        ur, gr = data[key].get("uniform", {}), data[key].get("guided", {})
        if ur.get("rmse") and gr.get("rmse"):
            gr["rmse_ratio_vs_uniform"] = gr["rmse"] / ur["rmse"]
            gr["time_ratio_vs_uniform"] = gr["ms"] / ur["ms"]
        with open(OUT, "w") as f:
            json.dump(data, f, indent=1)
        print(json.dumps(data[key], indent=1))
        return

    problem, depth = _build(a.scene)

    def run(cls, spp, train=0, net=None):
        integ = cls(problem, _settings(spp, depth, train), "/tmp/refproto")
        if net is not None:
            integ.reset_network(net)
        t_p = time.time()
        integ.prepare()
        prep = time.time() - t_p
        ms = integ.solve()
        img = np.asarray(integ.films["SOLUTION"].pixels())
        steps = int(integ.total_walk_steps)
        return img, {"spp": spp, "train_spp": train, "ms": ms,
                     "prepare_s": round(prep, 1), "walk_steps": steps,
                     "steps_per_s": steps / max(ms / 1e3, 1e-9),
                     "train_spp_achieved":
                         getattr(integ, "train_spp_achieved", None)}

    if a.phase == "gt":
        img, row = run(UniformIntegrator, a.gt_spp)
        np.savez_compressed(gt_path, img=img.astype(np.float32),
                            spp=a.gt_spp)
        row["gt_spp"] = a.gt_spp
        row["gt_path"] = gt_path
        _merge(OUT, key, {"gt": row})
        return

    gt = np.load(gt_path)["img"] if os.path.exists(gt_path) else None
    if gt is None:
        print(f"no GT at {gt_path}; recording perf row without RMSE "
              f"(re-run this phase after --phase gt to add it)",
              file=sys.stderr)

    if a.phase == "u":
        img, row = run(UniformIntegrator, 1024)
        if gt is not None:
            row["rmse"] = rmse(img, gt)
        np.savez_compressed(os.path.join(CACHE, f"{a.scene}_u.npz"),
                            img=img.astype(np.float32))
        _merge(OUT, key, {"uniform": row})
    else:
        img, row = run(GuidedIntegrator, 1024, 256,
                       NET_FILLE if a.scene == "fille" else NET)
        if gt is not None:
            row["rmse"] = rmse(img, gt)
        np.savez_compressed(os.path.join(CACHE, f"{a.scene}_n.npz"),
                            img=img.astype(np.float32))
        data = json.load(open(OUT)) if os.path.exists(OUT) else {}
        ur = data.get(key, {}).get("uniform", {})
        if ur.get("rmse") and row.get("rmse"):
            row["rmse_ratio_vs_uniform"] = row["rmse"] / ur["rmse"]
            row["time_ratio_vs_uniform"] = row["ms"] / ur["ms"]
        _merge(OUT, key, {"guided": row})


if __name__ == "__main__":
    main()
