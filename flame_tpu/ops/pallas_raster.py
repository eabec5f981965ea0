"""Fused Pallas TPU rasterizer.

The XLA tile-binned rasterizer (ops/rasterize.py) is ~80x off
compute-bound: its two-level binning materializes per-cell candidate
blocks through HBM and the per-cell eval runs as many small fused ops.
This kernel keeps the (cheap, exact) XLA level-1 bbox binning — one
top_k over the tile/triangle overlap mask — and replaces everything
below it with one Pallas program per (32, 128) image tile:

  * The tile's K1 candidate triangles arrive as a (K1, 16) VMEM block
    of edge-function coefficients [a0..2, b0..2, c0..2, v0..2, area]
    (from rasterize._tri_setup, so vertex-truncation semantics match
    the reference's cv::Point conversion, image_utils.cc:383-391).
  * Candidates live in SUBLANES, the tile row's 128 pixels in LANES:
    each row evaluates all K1 edge functions as (K1, 128) VPU ops and
    max-reduces over sublanes into the output row.
  * Row stepping is incremental: w(y+1) = w(y) + b — three adds per row
    instead of re-evaluating a*x + b*y + c.

Semantics identical to rasterize.rasterize (same inside test, same
max-combine tie-breaking, NaN background); equality is tested against
rasterize_bruteforce on random Delaunay meshes in interpret mode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flame_tpu.ops import rasterize as xr

LANES = 128
NEG = -3.0e38  # finite -inf stand-in (avoids inf*0 NaNs in the kernel)


def _kernel(tile_h: int, k1: int, cd_ref, out_ref):
    """cd_ref: (1, K1, 16) candidate coefficients; out_ref: (tile_h, 128).
    Field layout: [a0 a1 a2 | b0 b1 b2 | c0 c1 c2 | v0 v1 v2 | area2 ...]
    with c pre-shifted to this tile's origin (w at tile pixel (0, 0))."""
    cd = cd_ref[0, 0]  # (K1, 16)
    a = [cd[:, 0:1], cd[:, 1:2], cd[:, 2:3]]  # (K1, 1) each
    b = [cd[:, 3:4], cd[:, 4:5], cd[:, 5:6]]
    c = [cd[:, 6:7], cd[:, 7:8], cd[:, 8:9]]
    v = [cd[:, 9:10], cd[:, 10:11], cd[:, 11:12]]
    inv_area = cd[:, 12:13]

    xs = jax.lax.broadcasted_iota(jnp.int32, (k1, LANES), 1).astype(
        jnp.float32)
    # Edge functions at row 0: w_k = a_k * x + c_k (c holds the tile
    # origin's a*ox + b*oy + c).
    w = [a[k] * xs + c[k] for k in range(3)]
    vv = [v[k] * inv_area for k in range(3)]

    w0, w1, w2 = w
    for y in range(tile_h):  # static unroll: tile_h stores
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        val = w0 * vv[0] + w1 * vv[1] + w2 * vv[2]
        cand = jnp.where(inside, val, NEG)
        out_ref[y, :] = jnp.max(cand, axis=0)
        w0, w1, w2 = w0 + b[0], w1 + b[1], w2 + b[2]


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "truncate", "tile_h", "max_per_tile", "interpret"))
def rasterize(verts: jax.Array, tris: jax.Array, vals: jax.Array,
              tri_valid: jax.Array, height: int, width: int,
              truncate: bool = True, tile_h: int = 32,
              max_per_tile: int = 160,
              interpret: bool = False) -> jax.Array:
    """Drop-in for rasterize.rasterize on TPU (returns (H, W) f32, NaN
    where uncovered)."""
    tile_w = LANES
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    n_tiles = nty * ntx
    T = tris.shape[0]
    K1 = min(max_per_tile, T)

    # --- Level-1 binning (same as rasterize.rasterize).
    vxy = jnp.concatenate([verts, vals[:, None],
                           jnp.zeros((verts.shape[0], 1), verts.dtype)],
                          axis=1)
    cg = vxy[tris]  # (T, 3, 4)
    a, b, c, area2 = xr._tri_setup(verts, tris, truncate,
                                   corners=cg[..., :2])
    tvals = cg[..., 2]

    p = cg[..., :2]
    if truncate:
        p = jnp.trunc(p)
    xmin = jnp.min(p[:, :, 0], axis=1)
    xmax = jnp.max(p[:, :, 0], axis=1)
    ymin = jnp.min(p[:, :, 1], axis=1)
    ymax = jnp.max(p[:, :, 1], axis=1)

    tids = jnp.arange(n_tiles)
    ty = (tids // ntx).astype(jnp.float32) * tile_h
    tx = (tids % ntx).astype(jnp.float32) * tile_w

    ok = tri_valid & (area2 > 0)
    overlap = ((xmin[None, :] <= tx[:, None] + (tile_w - 1)) &
               (xmax[None, :] >= tx[:, None]) &
               (ymin[None, :] <= ty[:, None] + (tile_h - 1)) &
               (ymax[None, :] >= ty[:, None]) & ok[None, :])
    key = jnp.where(overlap, jnp.arange(T, dtype=jnp.int32)[None, :], -1)
    kvals, _ = jax.lax.top_k(key, K1)  # (n_tiles, K1)
    order = jnp.maximum(kvals, 0)
    k_valid = kvals >= 0

    # --- Per-candidate coefficient rows, origin-shifted per tile.
    inv_area = jnp.where(area2 > 0, 1.0 / jnp.where(area2 > 0, area2, 1.0),
                         0.0)
    packed = jnp.concatenate(
        [a, b, c, tvals, inv_area[:, None],
         jnp.zeros((T, 3), a.dtype)], axis=1)  # (T, 16)
    cdata = packed[order]  # (n_tiles, K1, 16)
    # Shift c to each tile's origin: c' = a*ox + b*oy + c. Dead slots get
    # c' = NEG so the inside test can never pass.
    oxy = jnp.stack([tx, ty], axis=1)  # (n_tiles, 2)
    cshift = (cdata[:, :, 0:3] * oxy[:, None, 0:1]
              + cdata[:, :, 3:6] * oxy[:, None, 1:2] + cdata[:, :, 6:9])
    cshift = jnp.where(k_valid[:, :, None], cshift, NEG)
    cdata = cdata.at[:, :, 6:9].set(cshift)

    cdata = cdata.reshape(nty, ntx, K1, 16)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h, K1),
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec((1, 1, K1, 16),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nty * tile_h, ntx * tile_w),
                                       jnp.float32),
        interpret=interpret,
    )(cdata)

    out = out[:height, :width]
    return jnp.where(out <= NEG * 0.5, jnp.nan, out)
