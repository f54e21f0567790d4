"""Evaluation grid: pixel -> world-space evaluation point.

Reference: core/evaluation_grid.h:27-33 (2D) and 60-64 (3D).  Batched over
pixel ids; all arrays float32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class EvaluationGrid(NamedTuple):
    dim: int
    scale: float
    pos: jnp.ndarray    # (D,)
    up: jnp.ndarray     # (D,)
    right: jnp.ndarray  # (D,) 3D only (ignored for 2D)

    @classmethod
    def from_json(cls, conf: dict, dim: int) -> "EvaluationGrid":
        m = conf.get("mData", conf)
        scale = float(m.get("scale", 1.0))
        pos = np.asarray(m.get("pos", [0.0] * dim), np.float32)
        up = np.asarray(m.get("up", [0.0, 1.0] if dim == 2 else [0.0, 0.0, 1.0]),
                        np.float32)
        right = np.asarray(m.get("right", [1.0, 0.0, 0.0][:dim] if dim == 3
                           else [1.0, 0.0]), np.float32)
        return cls(dim=dim, scale=scale, pos=jnp.asarray(pos), up=jnp.asarray(up),
                   right=jnp.asarray(right))

    def points(self, pixel_ids, frame_size):
        """pixel_ids (N,) int -> evaluation points (N, D).

        2D maps NDC through (u, v) = (perp(up), up) (evaluation_grid.h:29-32);
        3D through (right, up) (evaluation_grid.h:62-63).
        """
        w, h = frame_size
        px = (pixel_ids % w).astype(jnp.float32)
        py = (pixel_ids // w).astype(jnp.float32)
        ndc_x = 2.0 * px / w - 1.0
        ndc_y = 2.0 * py / h - 1.0
        if self.dim == 2:
            u = jnp.stack([self.up[1], -self.up[0]])
            v = self.up
        else:
            u = self.right
            v = self.up
        return (self.scale * (ndc_x[:, None] * u[None] + ndc_y[:, None] * v[None])
                + self.pos[None])
