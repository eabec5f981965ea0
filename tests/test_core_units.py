"""Unit tests for detection, keyframe scoring, mesh filters, colormaps."""

import numpy as np
import jax.numpy as jnp

from flame_tpu.geometry import se3, camera, epipolar
from flame_tpu.core import detection, keyframe
from flame_tpu.mesh import filters
from flame_tpu.params import TriangleFilterParams
from flame_tpu.utils import colormaps


def make_geo(t=(0.3, 0.0, 0.0)):
    K = camera.make_k(100.0, 100.0, 80.0, 60.0)
    Kinv = camera.inv_k(K)
    return K, Kinv, epipolar.load(K, Kinv, se3.quat_identity(),
                                  jnp.asarray(t, jnp.float32))


# ---------------------------------------------------------------------------
# Detection.
# ---------------------------------------------------------------------------


def test_table_bf16_flag_governs_stack_pack_dtype():
    """LineStereoParams.table_bf16 must control the persistent img_pack
    table's dtype (the float-imagery escape hatch covers ALL packed
    sample tables, not just the line-stereo one — review finding r4)."""
    from flame_tpu.core.flame import Flame
    from flame_tpu.params import Params, FilterParams, LineStereoParams
    K = camera.make_k(50.0, 50.0, 16.0, 12.0)
    Kinv = camera.inv_k(K)
    base = dict(feature_capacity=64, edge_capacity=192,
                triangle_capacity=128, poseframe_capacity=2)
    fl = Flame(32, 24, K, Kinv, Params(**base))
    assert fl._stack.img_pack.dtype == jnp.bfloat16
    p32 = Params(**base, fparams=FilterParams(
        sparams=LineStereoParams(table_bf16=False)))
    fl32 = Flame(32, 24, K, Kinv, p32)
    assert fl32._stack.img_pack.dtype == jnp.float32


def test_detect_finds_vertical_edge():
    """A single strong vertical edge: winners only in its cells, at its x."""
    K, Kinv, geo = make_geo()
    H, W = 120, 160
    img = np.zeros((H, W), np.float32)
    img[:, 80:] = 200.0
    gx = np.zeros((H, W), np.float32)
    gx[:, 79:81] = 100.0  # strong x gradient at the edge
    gy = np.zeros((H, W), np.float32)
    res = detection.detect(geo, jnp.asarray(gx), jnp.asarray(gy),
                           min_grad_mag=5.0, win_size=16, border=4)
    score = np.asarray(res.best_score)
    xy = np.asarray(res.best_xy)
    hits = score > 0
    assert hits.any()
    # All winners at x in {79, 80}.
    assert np.all(np.isin(xy[hits][:, 0], (79, 80)))
    # Only the cell column containing x=79..80 fires (16px cells: col 4-5).
    cols = np.nonzero(hits.any(axis=0))[0]
    assert set(cols) <= {4, 5}


def test_detect_epipolar_direction_gate():
    """Gradient orthogonal to the epiline must not be detected."""
    K, Kinv, geo = make_geo(t=(0.3, 0.0, 0.0))  # horizontal epilines
    H, W = 64, 96
    gx = np.zeros((H, W), np.float32)
    gy = np.full((H, W), 50.0, np.float32)  # purely vertical gradient
    res = detection.detect(geo, jnp.asarray(gx), jnp.asarray(gy),
                           min_grad_mag=5.0, win_size=16, border=4)
    assert not (np.asarray(res.best_score) > 0).any()


def test_occupied_cells():
    xy = jnp.asarray([[5.0, 5.0], [37.0, 21.0], [100.0, 100.0]])
    valid = jnp.asarray([True, True, False])
    occ = np.asarray(detection.occupied_cells(xy, valid, 16, 8, 8))
    assert occ[0, 0]
    assert occ[1, 2]
    assert not occ[6, 6]  # invalid feature doesn't occupy
    assert occ.sum() == 2


# ---------------------------------------------------------------------------
# Keyframe scoring.
# ---------------------------------------------------------------------------


def test_keyframe_score_prefers_disparity_near_target():
    K = np.asarray(camera.make_k(100.0, 100.0, 80.0, 60.0))
    Kinv = np.linalg.inv(K)
    ident = np.array([1.0, 0, 0, 0])
    # Disparity for baseline b at min_depth 1: ~ fx*b. Target 100 -> b=1 best.
    s_good = keyframe.score(160, 120, K, Kinv, ident, np.array([1.0, 0, 0]),
                            min_depth=1.0, max_disparity=100.0)
    s_small = keyframe.score(160, 120, K, Kinv, ident, np.array([0.05, 0, 0]),
                             min_depth=1.0, max_disparity=100.0)
    s_big = keyframe.score(160, 120, K, Kinv, ident, np.array([4.0, 0, 0]),
                           min_depth=1.0, max_disparity=100.0)
    assert s_good > s_small
    assert s_good > s_big


def test_keyframe_score_rejects_large_rotation():
    K = np.asarray(camera.make_k(100.0, 100.0, 80.0, 60.0))
    Kinv = np.linalg.inv(K)
    angle = np.radians(75.0)
    q = np.array([np.cos(angle / 2), 0, np.sin(angle / 2), 0])
    s = keyframe.score(160, 120, K, Kinv, q, np.zeros(3))
    assert s < -1e30  # hard cutoff at 60 degrees


def test_keyframe_score_overlap_decreases_with_offset():
    K = np.asarray(camera.make_k(100.0, 100.0, 80.0, 60.0))
    Kinv = np.linalg.inv(K)
    ident = np.array([1.0, 0, 0, 0])
    # Same disparity magnitude, but huge lateral offset reduces overlap...
    # at max_depth=50 a 1m baseline barely shifts; use extreme offsets.
    s0 = keyframe.score(160, 120, K, Kinv, ident, np.array([1.0, 0, 0]),
                        min_depth=1.0, max_depth=10.0, max_disparity=100.0)
    s_off = keyframe.score(160, 120, K, Kinv, ident, np.array([1.0, 6.0, 0]),
                           min_depth=1.0, max_depth=10.0, max_disparity=100.0)
    assert s0 > s_off


# ---------------------------------------------------------------------------
# Mesh filters + normals.
# ---------------------------------------------------------------------------


def _plane_mesh():
    """Square mesh on a fronto-parallel plane at depth 4."""
    K = camera.make_k(100.0, 100.0, 80.0, 60.0)
    Kinv = camera.inv_k(K)
    verts = jnp.array([[40.0, 30.0], [120.0, 30.0], [120.0, 90.0],
                       [40.0, 90.0]])
    tris = jnp.array([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    ids = jnp.full((4,), 0.25)
    return K, Kinv, verts, tris, ids


def test_normals_fronto_parallel_plane():
    K, Kinv, verts, tris, ids = _plane_mesh()
    n = np.asarray(filters.vertex_normals(Kinv, verts, ids, tris,
                                          jnp.ones(2, bool)))
    # Outward normal of a wall facing the camera: -z.
    np.testing.assert_allclose(n[:, 2], -1.0, atol=1e-5)


def test_oblique_filter_keeps_fronto_parallel():
    K, Kinv, verts, tris, ids = _plane_mesh()
    v = filters.oblique_filter(TriangleFilterParams(), Kinv, verts, ids, tris,
                               jnp.ones(2, bool))
    assert bool(jnp.all(v))


def test_oblique_filter_drops_steep_idepth_span():
    K, Kinv, verts, tris, _ = _plane_mesh()
    ids = jnp.array([0.25, 0.25, 0.9, 0.9])  # huge idepth span
    v = filters.oblique_filter(TriangleFilterParams(), Kinv, verts, ids, tris,
                               jnp.ones(2, bool))
    assert not bool(jnp.any(v))


def test_edge_length_filter():
    K, Kinv, verts, tris, ids = _plane_mesh()
    p = TriangleFilterParams(edge_length_thresh=0.2)  # 0.2*160 = 32px max
    v = filters.edge_length_filter(p, 160, verts, tris, jnp.ones(2, bool))
    assert not bool(jnp.any(v))  # all edges are ~60-100 px
    p2 = TriangleFilterParams(edge_length_thresh=0.9)
    v2 = filters.edge_length_filter(p2, 160, verts, tris, jnp.ones(2, bool))
    assert bool(jnp.all(v2))


def test_idepth_filter():
    K, Kinv, verts, tris, _ = _plane_mesh()
    ids = jnp.array([0.001, 0.001, 0.001, 0.5])
    v = filters.idepth_filter(TriangleFilterParams(), ids, tris,
                              jnp.ones(2, bool))
    # Triangle 0 mean = 0.001 -> dropped; triangle 1 mean ~0.167 -> kept.
    assert not bool(v[0])
    assert bool(v[1])


def test_plane_param_normal_flat():
    K = camera.make_k(100.0, 100.0, 80.0, 60.0)
    uv = jnp.array([[80.0, 60.0]])
    n = np.asarray(filters.plane_param_normal(K, uv, jnp.array([0.25]),
                                              jnp.array([0.0]),
                                              jnp.array([0.0])))
    np.testing.assert_allclose(n[0], [0, 0, -1], atol=1e-6)


# ---------------------------------------------------------------------------
# Colormaps.
# ---------------------------------------------------------------------------


def test_jet_endpoints():
    c = colormaps.jet(np.array([0.0, 0.5, 1.0]))
    assert c.shape == (3, 3)
    # Classic jet: dark blue at 0, green mid, dark red at 1.
    assert c[0, 2] > 100 and c[0, 0] < 50
    assert c[2, 0] > 100 and c[2, 2] < 50
    assert c[1, 1] > 200


def test_idepth_color_invalid_black():
    c = colormaps.idepth_color(np.array([np.nan, -1.0, 0.5]))
    assert np.all(c[0] == 0)
    assert np.all(c[1] == 0)
    assert c[2].sum() > 0


def test_normal_map_range():
    n = np.array([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    c = colormaps.normal_map(n)
    assert c[0, 2] == 0
    assert c[1, 0] == 255


# ---------------------------------------------------------------------------
# KeyframeSelector pool + LoadTracker.
# ---------------------------------------------------------------------------


def test_keyframe_selector_pool():
    from flame_tpu.core.keyframe import KeyframeSelector
    K = np.asarray(camera.make_k(100.0, 100.0, 80.0, 60.0))
    sel = KeyframeSelector(K, max_kfs=3, new_kf_thresh=0.1)
    img = np.zeros((120, 160), np.uint8)
    ident = np.array([1.0, 0, 0, 0])

    # Empty pool: -1, frame added.
    assert sel.select(0.0, img, (ident, np.zeros(3))) == -1
    assert len(sel.poses) == 1
    # Small motion: no new keyframe, best is 0.
    assert sel.select(0.1, img, (ident, np.array([0.05, 0, 0]))) == 0
    assert len(sel.poses) == 1
    # Larger motions add keyframes; capacity caps at 3.
    for i, x in enumerate((0.3, 0.6, 0.9, 1.2)):
        sel.select(0.2 + i, img, (ident, np.array([x, 0.0, 0.0])))
    assert len(sel.poses) == 3
    t, im, pose = sel.get_keyframe(-1)
    assert pose[1][0] == 1.2


def test_load_tracker():
    from flame_tpu.utils.load_tracker import LoadTracker
    lt = LoadTracker()
    first = lt.get()
    # Burn a little CPU so the second sample is nonzero.
    x = sum(i * i for i in range(200000))
    out = lt.get()
    assert out["mem_sys_total_kb"] > 0
    assert out["mem_process_rss_kb"] > 0
    assert 0.0 <= out["cpu_total_pct"] <= 100.0
    assert 0.0 <= out["cpu_process_pct"] <= 100.0 * os.cpu_count()


import os
