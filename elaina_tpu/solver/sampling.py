"""Uniform sphere / hemisphere direction sampling and PDFs.

TPU-native counterpart of util/sampling.h:15-131.  All samplers are
counter-based (``jax.random``) and batched: ``key`` + leading batch shape in,
``(..., D)`` directions out.  In 2D the "sphere" is the unit circle and the
"hemisphere" a half-circle around the local +y (normal) axis; in 3D the
hemisphere is around local +z — matching the reference's frame conventions
(util/transformation.h).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

M_2PI = 2.0 * math.pi
M_4PI = 4.0 * math.pi


def uniform_sample_sphere(key, shape, dim: int) -> jnp.ndarray:
    """Uniform direction on S^{dim-1} (util/sampling.h:19-33)."""
    if dim == 2:
        theta = jax.random.uniform(key, shape) * M_2PI
        return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    k1, k2 = jax.random.split(key)
    z = 1.0 - 2.0 * jax.random.uniform(k1, shape)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = M_2PI * jax.random.uniform(k2, shape)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_sphere_pdf(dim: int) -> float:
    """Constant direction pdf (util/sampling.h:38-48)."""
    return 1.0 / M_2PI if dim == 2 else 1.0 / M_4PI


def uniform_sample_hemisphere(key, shape, dim: int) -> jnp.ndarray:
    """Uniform direction on the local upper half sphere (util/sampling.h:68-85).

    2D: +y half-circle (angle in (0, pi)); 3D: +z hemisphere.  Rotate with
    ``frame_from_normal`` + ``to_world`` to align with a surface normal.
    """
    if dim == 2:
        phi = math.pi * jax.random.uniform(key, shape)
        return jnp.stack([jnp.cos(phi), jnp.sin(phi)], axis=-1)
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, shape)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = M_2PI * jax.random.uniform(k2, shape)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_hemisphere_pdf(dim: int) -> float:
    """util/sampling.h:90-100."""
    return 1.0 / math.pi if dim == 2 else 1.0 / M_2PI


def conditional_sample_sphere_pdf(dir_pdf, r, dim: int):
    """Direction pdf converted to a solid pdf at radius ``r`` (util/sampling.h:53-63)."""
    return dir_pdf / r if dim == 2 else dir_pdf / (r * r)


def sphere_measure(dim: int) -> float:
    """|S^{dim-1}|: 2*pi (2D) or 4*pi (3D) (util/sampling.h:105-115)."""
    return M_2PI if dim == 2 else M_4PI
