"""Harmonic Green's functions on balls (2D disk / 3D ball).

TPU-native counterpart of util/green.h:11-119.  The reference samples the 2D
radial density by rejection with an iteration cap (green.h:45-62); here both
radial densities are sampled in closed form, which is exact and branch-free —
ideal for a TPU lane batch:

* 2D: pdf_r(r) = 4 r ln(R/r) / R^2.  With t = (r/R)^2 the tail function is
  t (1 - ln t), i.e. -ln t ~ Gamma(2,1), so r = R * sqrt(u1 * u2) with two
  uniforms (product of two uniforms has density -ln w).
* 3D: pdf_r(r) = 6 r (R - r) / R^3, i.e. r/R ~ Beta(2,2), sampled exactly as
  the median of three uniforms.

The post-sample clamps match green.h:64-68/109-113 exactly:
``r = max(1e-4, r)``; ``r > R -> R/2``; returned pdf is ``pdf_r`` at the
clamped radius.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

GREEN_R_CLAMP = 1e-4  # ELAINA_GREEN_FUNC_R_CLAMP (green.h:9)
M_2PI = 2.0 * math.pi
M_4PI = 4.0 * math.pi


def green_eval(r, R, dim: int):
    """G(r; R) for the harmonic Green's function of a ball (green.h:22-25, 82-89)."""
    if dim == 2:
        return jnp.log(R / r) / M_2PI
    return (1.0 / r - 1.0 / R) / M_4PI


def green_norm(R, dim: int):
    """Integral of G over the ball (green.h:27-30, 92-95)."""
    if dim == 2:
        return R * R / 4.0
    return R * R / 6.0


def green_pdf_radius(r, R, dim: int):
    """Normalized radial density |S^{d-1}| r^{d-1} G(r) / norm (green.h:32-35, 97-100)."""
    if dim == 2:
        return 4.0 * r * jnp.log(R / r) / (R * R)
    return 6.0 * r * (R - r) / (R * R * R)


def green_sample_radius(u: jnp.ndarray, R: jnp.ndarray, dim: int):
    """Sample the radial density. ``u``: (..., 3) uniforms; returns (r, pdf)."""
    if dim == 2:
        r = R * jnp.sqrt(u[..., 0] * u[..., 1])
    else:
        r = R * jnp.median(u[..., :3], axis=-1)
    r = jnp.maximum(GREEN_R_CLAMP, r)
    r = jnp.where(r > R, R / 2.0, r)
    return r, green_pdf_radius(r, R, dim)
