"""Small geometric math helpers (frames, reflection, interpolation).

TPU-native equivalents of the reference's frame/reflection utilities
(reference: util/transformation.h:7-72, util/math_utils.h:141-156,
core/math/include/krrmath/functors.h:60-95).  Everything here is pure JAX,
shaped for batched ``(..., D)`` operation.
"""

from __future__ import annotations

import jax.numpy as jnp


def perp2(v: jnp.ndarray) -> jnp.ndarray:
    """Counter-clockwise perpendicular of a 2D vector, normalized.

    Matches ``utils::getPerpendicular(Vector2f)`` (util/math_utils.h:153-156):
    ``(-v.y, v.x) / |v|``.
    """
    p = jnp.stack([-v[..., 1], v[..., 0]], axis=-1)
    return p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-20)


def perp3(u: jnp.ndarray) -> jnp.ndarray:
    """A unit vector perpendicular to ``u`` (3D).

    Same axis-selection scheme as ``utils::getPerpendicular(Vector3f)``
    (util/math_utils.h:141-151): cross ``u`` with the canonical axis along
    its smallest absolute component.
    """
    a = jnp.abs(u)
    # one-hot of the smallest-|.| axis
    xm = (a[..., 0] <= a[..., 1]) & (a[..., 0] <= a[..., 2])
    ym = (~xm) & (a[..., 1] <= a[..., 2])
    zm = ~(xm | ym)
    axis = jnp.stack(
        [xm.astype(u.dtype), ym.astype(u.dtype), zm.astype(u.dtype)], axis=-1
    )
    v = jnp.cross(u, axis)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


# ---------------------------------------------------------------------------
# Frames.  2D local coordinates are (tangent, normal); 3D are (T, B, N) with
# the normal in the last slot — matching Frame<2>::toWorld (T*v0 + N*v1) and
# Frame<3>::toWorld (T*v0 + B*v1 + N*v2) at util/transformation.h:16-36.
# ---------------------------------------------------------------------------


def frame_from_normal_2d(n: jnp.ndarray):
    """(N, T) frame from a 2D normal; T = -perp(n) (util/transformation.h:52-55)."""
    return n, -perp2(n)


def frame_from_tangent_2d(t: jnp.ndarray):
    """(N, T) frame from a 2D tangent; N = perp(t) (util/transformation.h:47-50)."""
    return perp2(t), t


def to_world_2d(frame, v_local: jnp.ndarray) -> jnp.ndarray:
    n, t = frame
    return t * v_local[..., 0:1] + n * v_local[..., 1:2]


def frame_from_normal_3d(n: jnp.ndarray):
    """(N, T, B) frame from a 3D normal (util/transformation.h:62-67)."""
    t = perp3(n)
    b = jnp.cross(n, t)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-20)
    return n, t, b


def to_world_3d(frame, v_local: jnp.ndarray) -> jnp.ndarray:
    n, t, b = frame
    return t * v_local[..., 0:1] + b * v_local[..., 1:2] + n * v_local[..., 2:3]


def to_world(dim: int, frame, v_local: jnp.ndarray) -> jnp.ndarray:
    return to_world_2d(frame, v_local) if dim == 2 else to_world_3d(frame, v_local)


def frame_from_normal(dim: int, n: jnp.ndarray):
    return frame_from_normal_2d(n) if dim == 2 else frame_from_normal_3d(n)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror ``v`` across the plane with normal ``n`` (util/transformation.h:69-72)."""
    return v - 2.0 * jnp.sum(v * n, axis=-1, keepdims=True) * n


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def norm(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.linalg.norm(v, axis=-1, keepdims=keepdims)


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def lerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return a + (b - a) * t


def geometric_interpolate(dim: int, values, uv):
    """Edge lerp (2D) or barycentric interpolation (3D).

    ``values`` is a tuple of DIM arrays ``(..., C)``; ``uv`` is ``(...,)`` for 2D
    or ``(..., 2)`` for 3D (krrmath/functors.h:60-95).
    """
    if dim == 2:
        a, b = values
        return lerp(a, b, uv[..., None])
    a, b, c = values
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    return a * (1.0 - u - v) + b * u + c * v
