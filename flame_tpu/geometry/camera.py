"""Pinhole camera intrinsics helpers.

Replaces the reference's raw Eigen Matrix3f K/Kinv plumbing
(/root/reference/src/flame/flame.h:123-125). Intrinsics are plain 3x3
arrays; helpers broadcast over arbitrary pixel batch shapes.
All pixel coordinates are (x, y) with x along image columns.
"""

import jax
import jax.numpy as jnp


def make_k(fx: float, fy: float, cx: float, cy: float,
           dtype=jnp.float32) -> jax.Array:
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
                     dtype=dtype)


def inv_k(K: jax.Array) -> jax.Array:
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = jnp.zeros((), dtype=K.dtype)
    o = jnp.ones((), dtype=K.dtype)
    return jnp.array([[1.0 / fx, z, -cx / fx],
                      [z, 1.0 / fy, -cy / fy],
                      [z, z, o]], dtype=K.dtype)


def project(K: jax.Array, p_cam: jax.Array) -> jax.Array:
    """Camera-frame point(s) (..., 3) -> pixel(s) (..., 2). No depth check."""
    x = K[0, 0] * p_cam[..., 0] + K[0, 2] * p_cam[..., 2]
    y = K[1, 1] * p_cam[..., 1] + K[1, 2] * p_cam[..., 2]
    return jnp.stack([x, y], axis=-1) / p_cam[..., 2:3]


def backproject(Kinv: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixel(s) (..., 2) -> unit-depth ray(s) (..., 3) in camera frame."""
    x = Kinv[0, 0] * uv[..., 0] + Kinv[0, 2]
    y = Kinv[1, 1] * uv[..., 1] + Kinv[1, 2]
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
