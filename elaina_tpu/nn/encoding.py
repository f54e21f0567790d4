"""Multiresolution dense-grid feature encoding (pure JAX).

TPU-native replacement for the tiny-cuda-nn DenseGrid encoding the guided
integrator configures (data/ladybug/n.json:50-57: base_resolution 8,
n_levels 8, n_features_per_level 4, per_level_scale 1.405, Linear
interpolation; created at guided/integrator.cu:1114).  Level l has
resolution floor(base * scale^l) cells, (res+1)^dim feature vertices, and
features are bi/tri-linearly interpolated at the normalized query point in
[0, 1]^dim.  All level tables are concatenated into one parameter vector;
lookups are fused gathers.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GridEncodingSpec(NamedTuple):
    dim: int
    n_levels: int
    n_features: int
    resolutions: tuple          # per-level cell counts
    offsets: tuple              # per-level start offset into the table (vertices)
    n_params: int               # total feature-vector count * n_features

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def make_grid_encoding(dim: int, conf: dict) -> GridEncodingSpec:
    base = int(conf.get("base_resolution", 8))
    n_levels = int(conf.get("n_levels", 8))
    n_features = int(conf.get("n_features_per_level", 4))
    scale = float(conf.get("per_level_scale", 1.405))
    resolutions = tuple(int(math.floor(base * scale**l)) for l in range(n_levels))
    offsets = []
    total = 0
    for r in resolutions:
        offsets.append(total)
        total += (r + 1) ** dim
    return GridEncodingSpec(dim=dim, n_levels=n_levels, n_features=n_features,
                            resolutions=resolutions, offsets=tuple(offsets),
                            n_params=total)


def init_grid_params(key, spec: GridEncodingSpec, scale: float = 1e-4):
    """tcnn-style small uniform init of the feature table."""
    return jax.random.uniform(key, (spec.n_params, spec.n_features),
                              jnp.float32, -scale, scale)


def grid_encode(spec: GridEncodingSpec, table: jnp.ndarray, x: jnp.ndarray):
    """x: (N, dim) normalized coords in [0, 1] -> (N, n_levels * n_features)."""
    dim = spec.dim
    x = jnp.clip(x, 0.0, 1.0)
    outs = []
    for lvl in range(spec.n_levels):
        res = spec.resolutions[lvl]
        off = spec.offsets[lvl]
        pos = x * res                                  # cell coords
        i0 = jnp.clip(pos.astype(jnp.int32), 0, res - 1)
        frac = pos - i0
        feat = 0.0
        for corner in np.ndindex(*([2] * dim)):
            ii = i0 + jnp.asarray(corner, jnp.int32)
            lin = ii[..., 0]
            for d in range(1, dim):
                lin = lin * (res + 1) + ii[..., d]
            w = jnp.ones(x.shape[:-1], table.dtype)
            for d in range(dim):
                w = w * (frac[..., d] if corner[d] else 1.0 - frac[..., d])
            feat = feat + w[..., None] * table[off + lin]
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)
