"""Image gradient stencils.

Replaces the reference's scalar + SSE central-gradient kernels
(/root/reference/src/flame/utils/image_utils.h:425-553 and
image_utils.cc:35-262) with whole-image vectorized stencils the XLA
compiler fuses on the VPU. Semantics match the reference exactly:
central differences 0.5*(right-left) in the interior, forward/backward
differences at the first/last column/row.
"""

import jax
import jax.numpy as jnp


def central_gradient(img: jax.Array):
    """Per-pixel (gradx, grady) with forward/backward differences at borders.

    img: (H, W) any numeric dtype; outputs are float32.
    """
    f = img.astype(jnp.float32)

    # X gradient.
    interior_x = 0.5 * (f[:, 2:] - f[:, :-2])
    first_col = (f[:, 1] - f[:, 0])[:, None]
    last_col = (f[:, -1] - f[:, -2])[:, None]
    gradx = jnp.concatenate([first_col, interior_x, last_col], axis=1)

    # Y gradient.
    interior_y = 0.5 * (f[2:, :] - f[:-2, :])
    first_row = (f[1, :] - f[0, :])[None, :]
    last_row = (f[-1, :] - f[-2, :])[None, :]
    grady = jnp.concatenate([first_row, interior_y, last_row], axis=0)

    return gradx, grady


def gradient_mag_sq(gradx: jax.Array, grady: jax.Array) -> jax.Array:
    """Squared gradient magnitude (reference image_utils.h getGradientMag)."""
    return gradx * gradx + grady * grady


def sobel(img: jax.Array):
    """3x3 Sobel gradients (reference image_utils.h:391-409), zero border."""
    f = img.astype(jnp.float32)
    kx = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    ky = kx.T
    pad = jnp.pad(f, 1)

    def conv3(p, k):
        out = jnp.zeros_like(f)
        for dy in range(3):
            for dx in range(3):
                out = out + k[dy, dx] * p[dy:dy + f.shape[0], dx:dx + f.shape[1]]
        return out

    return conv3(pad, kx), conv3(pad, ky)


def max_filter3(img: jax.Array) -> jax.Array:
    """3x3 max filter (reference image_utils.h:333-379), edge-replicated."""
    p = jnp.pad(img, 1, mode="edge")
    H, W = img.shape
    out = img
    for dy in range(3):
        for dx in range(3):
            out = jnp.maximum(out, p[dy:dy + H, dx:dx + W])
    return out
