"""Barycentric mesh rasterization into dense value maps.

TPU-native replacement for the reference's SSE scanline rasterizer
(/root/reference/src/flame/utils/rasterization.cc:164-245) and
interpolateMesh (/root/reference/src/flame/utils/image_utils.cc:373-419).

Instead of per-triangle scanline loops with masked SSE stores, we evaluate
edge functions for (pixel, triangle) pairs and combine with a max-reduce:
a triangulation covers each pixel with at most one triangle, so reducing
`where(inside, value, -inf)` over triangles reconstructs the interpolated
map (ties on shared edges pick the max; the reference picks the
last-drawn triangle — values agree on edges up to interpolation error).

Two implementations:
  * rasterize_bruteforce: every triangle against every pixel, chunked scan.
    Reference implementation for tests.
  * rasterize: two-level tile binning. Triangles are binned to image tiles
    by bounding box, each tile only tests its K nearest-binned triangles.
    ~10x less work; everything stays dense and jit-friendly.

Semantics matched to the reference:
  * Vertex coordinates are truncated to integers before rasterization (the
    reference converts Point2f -> cv::Point, truncating toward zero,
    image_utils.cc:383-391).
  * A pixel is inside if all three edge functions are >= 0 for a CCW
    triangle; we normalize orientation by the signed area so either
    winding works (the reference manually reverses its CW triangles).
  * Background is NaN (flame.cc:412).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _tri_setup(verts: jax.Array, tris: jax.Array, truncate: bool):
    """Per-triangle edge-function coefficients.

    verts: (V, 2) float vertex positions; tris: (T, 3) int32 indices.
    Returns a, b, c arrays of shape (T, 3) such that edge function k at
    pixel (x, y) is a[:, k]*x + b[:, k]*y + c[:, k], normalized to be >= 0
    inside regardless of winding, plus area2 (T,) the normalization.
    """
    p = verts[tris]  # (T, 3, 2)
    if truncate:
        p = jnp.trunc(p)
    v0, v1, v2 = p[:, 0], p[:, 1], p[:, 2]

    def edge_coeffs(pa, pb):
        # w(p) = cross(pb - pa, p - pa) = a*x + b*y + c.
        a = pa[:, 1] - pb[:, 1]
        b = pb[:, 0] - pa[:, 0]
        c = pb[:, 1] * pa[:, 0] - pb[:, 0] * pa[:, 1]
        return a, b, c

    # Barycentric numerators: w0 from edge (v1,v2), w1 from (v2,v0),
    # w2 from (v0,v1); w0+w1+w2 = 2*signed_area.
    a0, b0, c0 = edge_coeffs(v1, v2)
    a1, b1, c1 = edge_coeffs(v2, v0)
    a2, b2, c2 = edge_coeffs(v0, v1)

    a = jnp.stack([a0, a1, a2], axis=-1)
    b = jnp.stack([b0, b1, b2], axis=-1)
    c = jnp.stack([c0, c1, c2], axis=-1)

    area2 = (v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1]) - \
            (v1[:, 1] - v0[:, 1]) * (v2[:, 0] - v0[:, 0])

    # Normalize sign so inside => all w >= 0.
    sign = jnp.where(area2 < 0, -1.0, 1.0)[:, None]
    return a * sign, b * sign, c * sign, jnp.abs(area2)


def _eval_chunk(a, b, c, area2, vals, valid, xs, ys):
    """Evaluate a chunk of triangles over a pixel grid.

    a,b,c: (C, 3); area2, valid: (C,); vals: (C, 3);
    xs: (W,), ys: (H,). Returns (C, H, W) candidate values (-inf outside).
    """
    # w[k] = a*x + b*y + c  -> (C, 3, H, W) if naive; fold the x/y terms.
    x = xs[None, None, None, :]
    y = ys[None, None, :, None]
    w = (a[:, :, None, None] * x + b[:, :, None, None] * y
         + c[:, :, None, None])  # (C, 3, H, W)
    inside = jnp.all(w >= 0, axis=1) & (valid & (area2 > 0))[:, None, None]
    denom = jnp.where(area2 > 0, area2, 1.0)[:, None, None]
    interp = jnp.einsum("ckhw,ck->chw", w, vals) / denom
    return jnp.where(inside, interp, -jnp.inf)


def rasterize_bruteforce(verts: jax.Array, tris: jax.Array, vals: jax.Array,
                         tri_valid: jax.Array, height: int, width: int,
                         truncate: bool = True, chunk: int = 128) -> jax.Array:
    """Reference-quality rasterizer: scan over triangle chunks.

    verts: (V, 2); tris: (T, 3) int32; vals: (V,); tri_valid: (T,) bool.
    Returns (H, W) float32 with NaN where uncovered.
    """
    T = tris.shape[0]
    pad = (-T) % chunk
    tris_p = jnp.pad(tris, ((0, pad), (0, 0)))
    valid_p = jnp.pad(tri_valid, (0, pad))

    a, b, c, area2 = _tri_setup(verts, tris_p, truncate)
    tvals = vals[tris_p]  # (T', 3)

    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)

    n_chunks = tris_p.shape[0] // chunk

    def body(carry, idx):
        sl = lambda arr: jax.lax.dynamic_slice_in_dim(arr, idx * chunk, chunk)
        cand = _eval_chunk(sl(a), sl(b), sl(c), sl(area2), sl(tvals),
                           sl(valid_p), xs, ys)
        return jnp.maximum(carry, jnp.max(cand, axis=0)), None

    init = jnp.full((height, width), -jnp.inf, dtype=jnp.float32)
    out, _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return jnp.where(jnp.isinf(out), jnp.nan, out)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "truncate", "tile_h", "tile_w", "max_per_tile"))
def rasterize(verts: jax.Array, tris: jax.Array, vals: jax.Array,
              tri_valid: jax.Array, height: int, width: int,
              truncate: bool = True, tile_h: int = 64, tile_w: int = 128,
              max_per_tile: int = 256) -> jax.Array:
    """Tile-binned rasterizer (production path).

    Bins triangles to (tile_h x tile_w) image tiles by bbox overlap, then
    each tile tests only its binned triangles. max_per_tile bounds the
    number of triangles any tile can see; overflow triangles are silently
    dropped, so capacity must exceed the max local density. For meshes
    from the detection grid (one vertex per win_size x win_size cell,
    win_size 16) a 64x128 tile plus its one-cell ring holds <= 60 cells
    ~= 120 triangles, well under 256. Tile size trades binning cost
    (n_tiles * T mask + cumsum) against per-pixel test cost (K * H * W);
    64x128 / K=256 measured fastest on TPU v5e at VGA (4.0 ms vs 6.9 at
    K=384) and is still exact on a 2700-point random Delaunay mesh.
    Arbitrary meshes with dense clusters can exceed the cap -- raise
    max_per_tile for such inputs.
    """
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    n_tiles = nty * ntx

    a, b, c, area2 = _tri_setup(verts, tris, truncate)
    tvals = vals[tris]
    T = tris.shape[0]

    # Triangle bboxes (in truncated-vertex space to match _tri_setup).
    p = verts[tris]
    if truncate:
        p = jnp.trunc(p)
    xmin = jnp.min(p[:, :, 0], axis=1)
    xmax = jnp.max(p[:, :, 0], axis=1)
    ymin = jnp.min(p[:, :, 1], axis=1)
    ymax = jnp.max(p[:, :, 1], axis=1)

    # Tile extents.
    tids = jnp.arange(n_tiles)
    ty = (tids // ntx).astype(jnp.float32) * tile_h
    tx = (tids % ntx).astype(jnp.float32) * tile_w

    # Overlap mask (n_tiles, T).
    overlap = ((xmin[None, :] <= tx[:, None] + (tile_w - 1)) &
               (xmax[None, :] >= tx[:, None]) &
               (ymin[None, :] <= ty[:, None] + (tile_h - 1)) &
               (ymax[None, :] >= ty[:, None]) &
               tri_valid[None, :] & (area2[None, :] > 0))

    # Per-tile compacted triangle indices via rank-scatter (argsort of the
    # (n_tiles, T) mask is ~1M keys and TPU sorts are slow; an exclusive
    # cumsum + scatter is a few fused passes).
    K = max_per_tile
    rank = jnp.cumsum(overlap, axis=1) - overlap  # exclusive prefix count
    dest = jnp.where(overlap & (rank < K), rank, K)
    tri_ids = jnp.broadcast_to(jnp.arange(T)[None, :], overlap.shape)
    order = jnp.zeros((n_tiles, K + 1), jnp.int32)
    order = order.at[
        jnp.broadcast_to(jnp.arange(n_tiles)[:, None], overlap.shape),
        dest].set(tri_ids, mode="drop")[:, :K]
    k_valid = jnp.take_along_axis(overlap, order, axis=1)  # (n_tiles, K)

    # Gather per-tile triangle data: (n_tiles, K, ...).
    ta = a[order]
    tb = b[order]
    tc = c[order]
    tarea = area2[order]
    tv = tvals[order]

    ys_local = jnp.arange(tile_h, dtype=jnp.float32)
    xs_local = jnp.arange(tile_w, dtype=jnp.float32)

    def tile_fn(ta, tb, tc, tarea, tv, kv, oy, ox):
        xs = xs_local + ox
        ys = ys_local + oy
        cand = _eval_chunk(ta, tb, tc, tarea, tv, kv, xs, ys)
        return jnp.max(cand, axis=0)  # (tile_h, tile_w)

    tiles = jax.vmap(tile_fn)(ta, tb, tc, tarea, tv, k_valid, ty, tx)

    # Reassemble (nty, ntx, th, tw) -> (H', W') -> crop.
    img = tiles.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
    img = img.reshape(nty * tile_h, ntx * tile_w)[:height, :width]
    return jnp.where(jnp.isinf(img), jnp.nan, img)


def interpolate_mesh(verts: jax.Array, tris: jax.Array, vals: jax.Array,
                     tri_valid: jax.Array, vtx_valid: jax.Array,
                     height: int, width: int, **kwargs) -> jax.Array:
    """interpolateMesh equivalent (reference image_utils.cc:373-396):
    a triangle is drawn iff the triangle and all three vertices are valid."""
    ok = tri_valid & jnp.all(vtx_valid[tris], axis=1)
    return rasterize(verts, tris, vals, ok, height, width, **kwargs)
