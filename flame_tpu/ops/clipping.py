"""Branchless Liang-Barsky line clipping.

Replaces the reference's scalar early-return implementation
(/root/reference/src/flame/utils/image_utils.cc:269-371) with a masked
formulation over the 4 box edges that broadcasts over batches of segments,
so the epipolar search-region construction vmaps across all features.
"""

import jax.numpy as jnp


def clip_line(xmin, xmax, ymin, ymax, x0, y0, x1, y1):
    """Clip segments (x0,y0)-(x1,y1) to the box [xmin,xmax]x[ymin,ymax].

    All inputs broadcast; returns (valid, x0c, y0c, x1c, y1c). Invalid
    segments (entirely outside) get their endpoints clamped to the box but
    valid=False, matching the reference's boolean + output contract.
    """
    x0 = jnp.asarray(x0, jnp.float32)
    y0 = jnp.asarray(y0, jnp.float32)
    x1 = jnp.asarray(x1, jnp.float32)
    y1 = jnp.asarray(y1, jnp.float32)

    dx = x1 - x0
    dy = y1 - y0

    # p/q for the 4 edges: left, right, bottom(y min), top(y max).
    p = jnp.stack([-dx, dx, -dy, dy], axis=-1)
    q = jnp.stack([x0 - xmin, xmax - x0, y0 - ymin, ymax - y0], axis=-1)

    r = q / jnp.where(p == 0, 1.0, p)

    # Parallel to an edge and outside it -> reject.
    reject_parallel = jnp.any((p == 0) & (q < 0), axis=-1)

    # Entering intersections (p < 0) raise t0; leaving (p > 0) lower t1.
    t0 = jnp.max(jnp.where(p < 0, r, 0.0), axis=-1)
    t1 = jnp.min(jnp.where(p > 0, r, 1.0), axis=-1)

    valid = jnp.logical_not(reject_parallel) & (t0 <= t1)

    x0c = jnp.clip(x0 + t0 * dx, xmin, xmax)
    y0c = jnp.clip(y0 + t0 * dy, ymin, ymax)
    x1c = jnp.clip(x0 + t1 * dx, xmin, xmax)
    y1c = jnp.clip(y0 + t1 * dy, ymin, ymax)

    return valid, x0c, y0c, x1c, y1c
