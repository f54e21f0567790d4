"""Checkpoint / resume for the guiding network + solve state.

The reference has no persistence at all (SURVEY.md §5 "Checkpoint/resume:
none"); this is a TPU-build extension: the guided trainer state (params,
EMA params, Adam moments) and the accumulated solution can be saved and
restored, so long solves survive preemption.  Plain ``.npz`` — no
framework dependency, works on any host.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..nn.network import AdamState, TrainerState


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_trainer(path: str, trainer: TrainerState, extra: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {}
    payload.update({f"params/{k}": v for k, v in _flatten(trainer.params).items()})
    payload.update({f"ema/{k}": v for k, v in _flatten(trainer.ema_params).items()})
    payload.update({f"mu/{k}": v for k, v in _flatten(trainer.opt.mu).items()})
    payload.update({f"nu/{k}": v for k, v in _flatten(trainer.opt.nu).items()})
    payload["opt_count"] = np.asarray(trainer.opt.count)
    if extra:
        payload["extra_json"] = np.frombuffer(
            json.dumps(extra).encode(), dtype=np.uint8)
    np.savez(path, **payload)


def load_trainer(path: str) -> tuple[TrainerState, dict]:
    z = np.load(path)

    def group(prefix):
        out = {}
        for key in z.files:
            if key.startswith(prefix):
                out[key[len(prefix):]] = jnp.asarray(z[key])
        return out

    extra = {}
    if "extra_json" in z.files:
        extra = json.loads(bytes(z["extra_json"]).decode())
    trainer = TrainerState(
        params=group("params/"),
        ema_params=group("ema/"),
        opt=AdamState(mu=group("mu/"), nu=group("nu/"),
                      count=jnp.asarray(z["opt_count"])),
    )
    return trainer, extra


def save_solve_state(path: str, solution_sum, spp_done: int,
                     extra: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, solution_sum=np.asarray(solution_sum),
             spp_done=np.int64(spp_done),
             extra_json=np.frombuffer(json.dumps(extra or {}).encode(),
                                      dtype=np.uint8))


def load_solve_state(path: str):
    z = np.load(path)
    extra = json.loads(bytes(z["extra_json"]).decode()) if "extra_json" in z.files else {}
    return jnp.asarray(z["solution_sum"]), int(z["spp_done"]), extra
