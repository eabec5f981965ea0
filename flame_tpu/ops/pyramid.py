"""Gaussian image pyramids.

Replaces the reference's cv::pyrDown-based pyramid
(/root/reference/src/flame/utils/pyramids.h:42-127) with the same 5-tap
binomial kernel [1 4 6 4 1]/16 applied separably followed by 2x decimation,
expressed as XLA convolutions.
"""

from typing import List

import jax
import jax.numpy as jnp

_KERNEL5 = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _blur5(img: jax.Array) -> jax.Array:
    """Separable 5-tap binomial blur with reflect-101 borders (matches
    cv::pyrDown's default border handling)."""
    f = img.astype(jnp.float32)
    p = jnp.pad(f, ((2, 2), (0, 0)), mode="reflect")
    out = jnp.zeros_like(f)
    for k in range(5):
        out = out + _KERNEL5[k] * p[k:k + f.shape[0], :]
    p = jnp.pad(out, ((0, 0), (2, 2)), mode="reflect")
    out2 = jnp.zeros_like(f)
    for k in range(5):
        out2 = out2 + _KERNEL5[k] * p[:, k:k + f.shape[1]]
    return out2


def pyr_down(img: jax.Array) -> jax.Array:
    """One pyramid level down: blur then take even rows/cols."""
    return _blur5(img)[::2, ::2]


def gaussian_pyramid(img: jax.Array, num_levels: int) -> List[jax.Array]:
    """Level 0 is the input image itself (reference pyramids.h:42-51)."""
    levels = [img.astype(jnp.float32)]
    for _ in range(num_levels - 1):
        levels.append(pyr_down(levels[-1]))
    return levels


def gradient_pyramid(levels: List[jax.Array]):
    """Central gradients of each pyramid level (reference pyramids.h:71-115)."""
    from flame_tpu.ops.gradients import central_gradient
    gradx, grady = [], []
    for lvl in levels:
        gx, gy = central_gradient(lvl)
        gradx.append(gx)
        grady.append(gy)
    return gradx, grady


def montage(levels: List) -> "np.ndarray":
    """Debug montage of a pyramid: level 0 on the left, successive levels
    stacked top-down in a half-width right column (reference
    pyramids.cc:29-70's display layout). Host-side numpy; returns a
    float32 (H, W + ceil(W/2)) image with unused cells zero."""
    import numpy as np
    lv = [np.asarray(l, np.float32) for l in levels]
    H, W = lv[0].shape
    cw = (W + 1) // 2
    out = np.zeros((H, W + cw), np.float32)
    out[:, :W] = lv[0]
    y = 0
    for l in lv[1:]:
        h, w = l.shape
        if y + h > H:
            break
        out[y:y + h, W:W + min(w, cw)] = l[:, :min(w, cw)]
        y += h
    return out
