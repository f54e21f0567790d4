"""Guiding network: grid encoding + MLP, trained with Adam + parameter EMA.

Replaces GuidingNetwork<T> (util/network.h:21-196: tcnn Encoding composed
with a FullyFusedMLP) and the tcnn Ema(Adam) optimizer stack
(guided/integrator.cu:1113-1119, data/ladybug/n.json:61-80).  The MLP is a
few dense layers sized for the MXU (64 wide); training runs in f32 (the
batch is large, the net tiny), inference uses the EMA weights exactly like
tcnn's Ema optimizer serves "smoothed" params for inference.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .encoding import GridEncodingSpec, grid_encode, init_grid_params, make_grid_encoding


class NetworkSpec(NamedTuple):
    encoding: GridEncodingSpec
    n_neurons: int
    n_hidden: int
    n_out: int


class AdamState(NamedTuple):
    mu: dict
    nu: dict
    count: jnp.ndarray


class TrainerState(NamedTuple):
    params: dict
    ema_params: dict
    opt: AdamState


def make_network(dim: int, n_out: int, conf: dict) -> NetworkSpec:
    enc = make_grid_encoding(dim, conf.get("encoding", {}))
    net = conf.get("network", {})
    return NetworkSpec(
        encoding=enc,
        n_neurons=int(net.get("n_neurons", 64)),
        n_hidden=int(net.get("n_hidden_layers", 3)),
        n_out=n_out,
    )


def init_params(key, spec: NetworkSpec) -> dict:
    keys = jax.random.split(key, spec.n_hidden + 3)
    params = {"table": init_grid_params(keys[0], spec.encoding)}
    dims = ([spec.encoding.out_dim] + [spec.n_neurons] * (spec.n_hidden + 1)
            + [spec.n_out])
    for i in range(len(dims) - 1):
        fan_in, fan_out = dims[i], dims[i + 1]
        bound = jnp.sqrt(6.0 / (fan_in + fan_out))
        params[f"w{i}"] = jax.random.uniform(
            keys[i + 1], (fan_in, fan_out), jnp.float32, -bound, bound)
        params[f"b{i}"] = jnp.zeros((fan_out,), jnp.float32)
    return params


def apply_network(spec: NetworkSpec, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (N, dim) normalized positions -> raw outputs (N, n_out).

    Hidden activations flow in bf16 (halves the HBM traffic that dominates
    at production lane counts; the reference's tcnn MLP computes in fp16,
    util/network.h:11-13) with f32 accumulation and f32 raw outputs.
    """
    h = grid_encode(spec.encoding, params["table"], x)
    n_layers = spec.n_hidden + 2
    for i in range(n_layers):
        h = jnp.dot(h.astype(jnp.bfloat16),
                    params[f"w{i}"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        h = h + params[f"b{i}"]
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h


class AdamConfig(NamedTuple):
    lr: float = 8e-3
    beta1: float = 0.9
    beta2: float = 0.99
    eps: float = 1e-15
    l2_reg: float = 1e-6
    ema_decay: float = 0.95

    @classmethod
    def from_json(cls, conf: dict) -> "AdamConfig":
        """Parse the tcnn Ema{nested: Adam} optimizer config
        (n.json:68-80)."""
        conf = conf or {}
        decay = float(conf.get("decay", 0.95))
        nested = conf.get("nested", conf)
        return cls(
            lr=float(nested.get("learning_rate", 8e-3)),
            beta1=float(nested.get("beta1", 0.9)),
            beta2=float(nested.get("beta2", 0.99)),
            eps=float(nested.get("epsilon", 1e-15)),
            l2_reg=float(nested.get("l2_reg", 1e-6)),
            ema_decay=decay,
        )


def init_trainer(key, spec: NetworkSpec) -> TrainerState:
    params = init_params(key, spec)
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainerState(params=params, ema_params=params,
                        opt=AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                                      count=jnp.zeros((), jnp.int32)))


def adam_ema_step(state: TrainerState, grads: dict, cfg: AdamConfig) -> TrainerState:
    # One nonfinite gradient batch (heavy-tailed Li/dirPdf weights on
    # high-contrast scenes) would permanently poison params, EMA, and every
    # later inference; drop the batch instead.  (The reference has no such
    # guard — tcnn trains through whatever arrives, guided/train.h:422-471.)
    finite = jnp.all(jnp.asarray(
        [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
    count = state.opt.count + 1
    t = count.astype(jnp.float32)

    # Stabilizers for the heavy-tailed KL weights (Li/dirPdf on
    # high-contrast scenes made the trained-guide quality BIMODAL over
    # seeds: equal-spp ratio 0.75 vs ~1.0, BENCH_variance.json).
    # Global-norm clipping at 0.5 is the measured default: it removed
    # the bimodality AND improved every seed (spot 256/64 ratio
    # 0.809±0.103 -> 0.704±0.013; 64/16 0.957±0.086 -> 0.758±0.030;
    # 3D parity 0.914 -> 0.902 — BENCH_variance_clip.json).  The
    # reference trains unclipped (tcnn Adam, guided/train.h) and would
    # inherit the same instability; this is a deliberate improvement,
    # not a parity break — the objective's optimum is unchanged.
    # ELAINA_GRAD_CLIP=0 disables; ELAINA_LR_WARMUP stays off (clip
    # dominated it in the A/B).
    clip = float(os.environ.get("ELAINA_GRAD_CLIP", "0.5") or 0)
    if clip > 0:
        gnorm = jnp.sqrt(sum(jnp.sum(g * g)
                             for g in jax.tree.leaves(grads)))
        scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-20))
        grads = jax.tree.map(lambda g: g * scale, grads)
    warm = float(os.environ.get("ELAINA_LR_WARMUP", "0") or 0)
    lr = cfg.lr * (jnp.minimum(t / warm, 1.0) if warm > 0 else 1.0)

    def upd(g, p, m, v):
        g = g + cfg.l2_reg * p
        m2 = cfg.beta1 * m + (1 - cfg.beta1) * g
        v2 = cfg.beta2 * v + (1 - cfg.beta2) * g * g
        mhat = m2 / (1 - cfg.beta1**t)
        vhat = v2 / (1 - cfg.beta2**t)
        p2 = p - lr * mhat / (jnp.sqrt(vhat) + cfg.eps)
        return p2, m2, v2

    g_flat, treedef = jax.tree.flatten(grads)
    p_flat = treedef.flatten_up_to(state.params)
    m_flat = treedef.flatten_up_to(state.opt.mu)
    v_flat = treedef.flatten_up_to(state.opt.nu)
    out = [upd(g, p, m, v) for g, p, m, v in zip(g_flat, p_flat, m_flat, v_flat)]
    params = jax.tree.unflatten(treedef, [o[0] for o in out])
    mu = jax.tree.unflatten(treedef, [o[1] for o in out])
    nu = jax.tree.unflatten(treedef, [o[2] for o in out])
    ema = jax.tree.map(
        lambda e, p: cfg.ema_decay * e + (1 - cfg.ema_decay) * p,
        state.ema_params, params)
    new = TrainerState(params=params, ema_params=ema,
                       opt=AdamState(mu=mu, nu=nu, count=count))
    return jax.tree.map(lambda a, b: jnp.where(finite, b, a), state, new)
