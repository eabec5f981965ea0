"""Fused Pallas TPU rasterizer.

The XLA tile-binned rasterizer (ops/rasterize.py) is ~80x off
compute-bound: its two-level binning materializes per-cell candidate
blocks through HBM and the per-cell eval runs as many small fused ops.
This kernel keeps the (cheap, exact) XLA level-1 bbox binning — one
top_k over the tile/triangle overlap mask — and replaces everything
below it with one Pallas program per (32, 128) image tile:

  * The tile's K1 candidate triangles arrive as a (K1, 16) VMEM block
    of edge-function coefficients [a0..2, b0..2, c0..2, v0..2, area,
    valid] (from rasterize._tri_setup, so vertex-truncation semantics
    match the reference's cv::Point conversion, image_utils.cc:383-391).
  * Candidates live in SUBLANES, the tile row's 128 pixels in LANES:
    each row evaluates all K1 edge functions as (K1, 128) VPU ops and
    max-reduces over sublanes into the output row.
  * Row stepping is incremental: w(y+1) = w(y) + b — three adds per row
    instead of re-evaluating a*x + b*y + c.
  * The tile-origin shift c' = a*ox + b*oy + c happens IN the kernel
    from the program ids (r4: the XLA prologue used to materialize it
    with a (n_tiles, K1, 3) dynamic-update-slice per call — ~0.12 ms of
    pure data movement, measured in the r4 device profile).

rasterize_batch() rasterizes the SAME triangle set from B viewpoints
(the per-frame dense maps of pipeline.batch_step) with ONE shared
binning pass: per-triangle bboxes are unioned over the B views, the
top_k candidate compaction runs once, and the kernel grid grows a
leading B axis. Binning (top_k over a (n_tiles, T) mask + sort) was
~1.4 ms/frame of the r4 device profile — 5 independent rasterize calls
per 4-frame batch — and is B-independent after sharing.

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


def _kernel(tile_h: int, k1: int, grid_dims: int, cd_ref, out_ref):
    """cd_ref: (1[, 1], K1, 16) candidate coefficients; out_ref:
    (tile_h, 128). Field layout: [a0 a1 a2 | b0 b1 b2 | c0 c1 c2 |
    v0 v1 v2 | inv_area | valid | unused x2] with c in IMAGE coordinates
    — the kernel shifts to this tile's origin from its program ids.
    grid_dims: 2 for (nty, ntx) grids, 3 for (B, nty, ntx)."""
    cd = cd_ref[(0,) * (cd_ref.ndim - 2)]  # (K1, 16)
    a = [cd[:, 0:1], cd[:, 1:2], cd[:, 2:3]]  # (K1, 1) each
    b = [cd[:, 3:4], cd[:, 4:5], cd[:, 5:6]]
    c = [cd[:, 6:7], cd[:, 7:8], cd[:, 8:9]]
    v = [cd[:, 9:10], cd[:, 10:11], cd[:, 11:12]]
    inv_area = cd[:, 12:13]
    vmask = cd[:, 13:14] > 0.0

    # Tile origin from the grid position: the last two grid axes are
    # (tile row, tile col) in both the single and batched variants.
    oy = (pl.program_id(grid_dims - 2) * tile_h).astype(jnp.float32)
    ox = (pl.program_id(grid_dims - 1) * LANES).astype(jnp.float32)

    xs = jax.lax.broadcasted_iota(jnp.int32, (k1, LANES), 1).astype(
        jnp.float32)
    # Edge functions at tile pixel (x, 0): w_k = a_k*(ox+x) + b_k*oy + c_k.
    w = [a[k] * xs + (a[k] * ox + b[k] * oy + c[k]) for k in range(3)]
    vv = [v[k] * inv_area for k in range(3)]

    w0, w1, w2 = w
    for y in range(tile_h):  # static unroll: tile_h stores
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & vmask
        val = w0 * vv[0] + w1 * vv[1] + w2 * vv[2]
        cand = jnp.where(inside, val, NEG)
        row = jnp.max(cand, axis=0)
        if grid_dims == 3:  # batched: out block is (1, tile_h, 128)
            out_ref[0, y, :] = row
        else:
            out_ref[y, :] = row
        w0, w1, w2 = w0 + b[0], w1 + b[1], w2 + b[2]


def _setup_one(verts, tris, vals, tri_valid, truncate):
    """Per-view edge coefficients + bboxes + the (T, 16) packed rows."""
    T = tris.shape[0]
    vxy = jnp.concatenate([verts, vals[:, None],
                           jnp.zeros((verts.shape[0], 1), verts.dtype)],
                          axis=1)
    # Three (T, 4) per-corner row gathers instead of one rank-3 vxy[tris]
    # gather: the (T, 3, 4) gather output forced XLA to interpose
    # layout-conversion copies (~0.28 ms/frame of the r4d device trace,
    # copy.2574-2577) between the gather and the row slicing below.
    c0, c1, c2 = (vxy[tris[:, k]] for k in range(3))
    corners = jnp.stack([c0[:, :2], c1[:, :2], c2[:, :2]], axis=1)
    a, b, c, area2 = xr._tri_setup(verts, tris, truncate, corners=corners)
    tvals = jnp.stack([c0[:, 2], c1[:, 2], c2[:, 2]], axis=1)

    p = corners
    if truncate:
        p = jnp.trunc(p)
    xmin = jnp.min(p[:, :, 0], axis=1)
    xmax = jnp.max(p[:, :, 0], axis=1)
    ymin = jnp.min(p[:, :, 1], axis=1)
    ymax = jnp.max(p[:, :, 1], axis=1)

    ok = tri_valid & (area2 > 0)
    inv_area = jnp.where(area2 > 0, 1.0 / jnp.where(area2 > 0, area2, 1.0),
                         0.0)
    packed = jnp.concatenate(
        [a, b, c, tvals, inv_area[:, None], ok[:, None].astype(a.dtype),
         jnp.zeros((T, 2), a.dtype)], axis=1)  # (T, 16)
    return packed, ok, (xmin, xmax, ymin, ymax)


def _bin_tiles(bbox, ok, n_tiles, tx, ty, tile_h, K1):
    """Level-1 bbox binning: (n_tiles, K1) candidate indices + validity."""
    xmin, xmax, ymin, ymax = bbox
    T = ok.shape[0]
    overlap = ((xmin[None, :] <= tx[:, None] + (LANES - 1)) &
               (xmax[None, :] >= tx[:, None]) &
               (ymin[None, :] <= ty[:, None] + (tile_h - 1)) &
               (ymax[None, :] >= ty[:, None]) & ok[None, :])
    key = jnp.where(overlap, jnp.arange(T, dtype=jnp.int32)[None, :], -1)
    kvals, _ = jax.lax.top_k(key, K1)  # (n_tiles, K1)
    return jnp.maximum(kvals, 0), kvals >= 0


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

    packed, ok, bbox = _setup_one(verts, tris, vals, tri_valid, truncate)

    tids = jnp.arange(n_tiles)
    ty = (tids // ntx).astype(jnp.float32) * tile_h
    tx = (tids % ntx).astype(jnp.float32) * tile_w
    order, k_valid = _bin_tiles(bbox, ok, n_tiles, tx, ty, tile_h, K1)

    # Dead candidate slots point at row 0; kill via the valid flag.
    cdata = packed[order]  # (n_tiles, K1, 16)
    cdata = cdata * k_valid[:, :, None].astype(cdata.dtype)

    cdata = cdata.reshape(nty, ntx, K1, 16)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h, K1, 2),
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


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "truncate", "tile_h", "max_per_tile", "interpret"))
def rasterize_batch(verts: jax.Array, tris: jax.Array, vals: jax.Array,
                    tri_valid: jax.Array, height: int, width: int,
                    truncate: bool = True, tile_h: int = 32,
                    max_per_tile: int = 192,
                    interpret: bool = False) -> jax.Array:
    """Rasterize one triangle SET from B viewpoints with ONE shared
    binning pass (the per-frame dense maps of pipeline.batch_step: the
    batch-start mesh projected into each frame's view).

    verts: (B, V, 2); tris: (T, 3) shared; vals: (B, V);
    tri_valid: (B, T). Returns (B, H, W) f32, NaN where uncovered.

    Binning uses the UNION of each triangle's per-view bboxes, so a
    tile's candidate list covers all B views at once; per-view dead
    candidates are masked in-kernel via the packed valid flag. The
    default max_per_tile is 192 (vs 160 single-view): union bboxes grow
    with inter-view motion, so per-tile candidate counts run slightly
    higher. Overflow drops triangles silently (same contract as
    rasterize.rasterize — capacities must exceed the max local density).
    """
    tile_w = LANES
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    n_tiles = nty * ntx
    B = verts.shape[0]
    T = tris.shape[0]
    K1 = min(max_per_tile, T)

    packed_b, ok_b, bbox_b = jax.vmap(
        lambda v, x, tv: _setup_one(v, tris, x, tv, truncate))(
            verts, vals, tri_valid)

    # Union bbox over views; views where the triangle is invalid must
    # not expand it.
    big = jnp.float32(3e38)
    xmin_b, xmax_b, ymin_b, ymax_b = bbox_b
    xmin = jnp.min(jnp.where(ok_b, xmin_b, big), axis=0)
    xmax = jnp.max(jnp.where(ok_b, xmax_b, -big), axis=0)
    ymin = jnp.min(jnp.where(ok_b, ymin_b, big), axis=0)
    ymax = jnp.max(jnp.where(ok_b, ymax_b, -big), axis=0)
    any_ok = jnp.any(ok_b, axis=0)

    tids = jnp.arange(n_tiles)
    ty = (tids // ntx).astype(jnp.float32) * tile_h
    tx = (tids % ntx).astype(jnp.float32) * tile_w
    order, k_valid = _bin_tiles((xmin, xmax, ymin, ymax), any_ok,
                                n_tiles, tx, ty, tile_h, K1)

    # Per-view candidate rows from the SHARED order (B row gathers).
    cdata = packed_b[:, order]  # (B, n_tiles, K1, 16)
    cdata = cdata * k_valid[None, :, :, None].astype(cdata.dtype)

    cdata = cdata.reshape(B, nty, ntx, K1, 16)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h, K1, 3),
        grid=(B, nty, ntx),
        in_specs=[pl.BlockSpec((1, 1, 1, K1, 16),
                               lambda b, i, j: (b, i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_h, tile_w),
                               lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nty * tile_h, ntx * tile_w),
                                       jnp.float32),
        interpret=interpret,
    )(cdata)

    out = out[:, :height, :width]
    return jnp.where(out <= NEG * 0.5, jnp.nan, out)
