"""Structured-scene quality: a slanted plane meeting a closer fronto-
parallel slab (depth discontinuity). NLTGV2's piecewise-planar prior
should reconstruct both surfaces and keep the discontinuity sharp — the
qualitative behavior FLaME's paper demonstrates."""

import numpy as np
import jax.numpy as jnp

from flame_tpu.core.flame import Flame
from flame_tpu.geometry import se3, camera
from flame_tpu.params import Params, DetectionParams, SolverParams

FX = 100.0
W, H = 160, 120
# Plane A (world X <= 0.8): slanted, Z = 4 + 0.35 * X.
# Plane B (world X > 0.8): fronto-parallel at Z = 2.2 (closer -> occludes).
ZA0, KA = 4.0, 0.35
ZB = 2.2
X_SPLIT = 0.8


def tex(X, Y):
    return (128 + 60 * np.sin(4.1 * X + 0.9 * Y) + 35 * np.cos(1.73 * X)
            + 18 * np.sin(2.31 * Y) + 10 * np.sin(0.83 * X))


def render_and_truth(cam_x):
    """Ray-cast the two-plane scene from camera (cam_x, 0, 0)."""
    vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)
    dx = (uu - W / 2) / FX
    dy = (vv - H / 2) / FX

    # Plane A: Z = ZA0 + KA * X with X = cam_x + dx * t, Z = t.
    tA = (ZA0 + KA * cam_x) / (1.0 - KA * dx)
    XA = cam_x + dx * tA
    # Plane B: Z = ZB.
    tB = np.full_like(tA, ZB)
    XB = cam_x + dx * ZB

    useB = XB > X_SPLIT  # closer slab occludes where it exists
    t = np.where(useB, tB, tA)
    X = np.where(useB, XB, XA)
    Y = dy * t
    img = np.clip(tex(X, Y), 0, 255).astype(np.uint8)
    idepth = (1.0 / t).astype(np.float32)
    return img, idepth


def test_structured_scene_reconstruction():
    params = Params(
        feature_capacity=512, edge_capacity=2048, triangle_capacity=1024,
        poseframe_capacity=8, min_height=-100.0, max_height=100.0,
        idepth_init=0.05, idepth_var_init=0.25,
        detection=DetectionParams(win_size=12),
        solver=SolverParams(n_iters_per_frame=40, max_vertex_degree=16),
        debug_quiet=True)
    K = camera.make_k(FX, FX, W / 2, H / 2)
    fl = Flame(W, H, K, camera.inv_k(K), params)

    for i in range(14):
        cam_x = 0.12 * i
        img, _ = render_and_truth(cam_x)
        pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
        fl.update(i * 0.1, i, pose, img, i % 2 == 0)

    final_cam_x = 0.12 * 13
    _, truth = render_and_truth(final_cam_x)
    est = fl.get_inverse_depth_map()
    ok = ~np.isnan(est)
    assert ok.mean() > 0.3

    rel = np.abs(est[ok] - truth[ok]) / truth[ok]
    assert np.median(rel) < 0.08, f"median rel idepth err {np.median(rel)}"

    # The discontinuity: compare mean estimated idepth well inside each
    # surface; the contrast must match the true contrast.
    # Image x of the world split at the final camera position:
    u_split = (X_SPLIT - final_cam_x) / ZB * FX + W / 2
    left = est[:, : max(int(u_split) - 12, 1)]
    right = est[:, min(int(u_split) + 12, W - 1):]
    lm = np.nanmedian(np.where(np.isnan(left), np.nan, left))
    rm = np.nanmedian(np.where(np.isnan(right), np.nan, right))
    # Left: slanted far plane (idepth ~ 0.2-0.24); right: slab (0.4545).
    assert rm - lm > 0.12, (lm, rm)
    np.testing.assert_allclose(rm, 1.0 / ZB, rtol=0.15)

    # Slant recovery: idepth on the far plane should *vary* across x the
    # way the slanted geometry dictates (not be flattened to constant).
    cols = np.arange(10, int(u_split) - 16)
    col_med = np.array([np.nanmedian(est[:, c]) for c in cols])
    t_cols = np.array([np.nanmedian(truth[:, c]) for c in cols])
    valid = ~np.isnan(col_med)
    if valid.sum() > 10:
        slope_est = np.polyfit(cols[valid], col_med[valid], 1)[0]
        slope_true = np.polyfit(cols[valid], t_cols[valid], 1)[0]
        assert np.sign(slope_est) == np.sign(slope_true)
        assert 0.3 < slope_est / slope_true < 3.0
