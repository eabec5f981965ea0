"""Non-ideal imagery stress (VERDICT r2 #4): an occluding box in the
ray-cast corridor (true depth discontinuity + genuinely occluded epipolar
matches) and photometric nuisance (exposure drift + sensor noise).

The reference carries machinery exactly for these pathologies — the chi^2
measurement gate (/root/reference/src/flame/stereo/inverse_depth_filter.cc
:268-305), per-feature dropout counters (flame.cc:1344-1376), match
status taxonomy, and the oblique-triangle filter at discontinuities
(flame.cc:2207-2283). These tests assert that machinery actually FIRES on
non-ideal input while reconstruction quality degrades gracefully, and
regression-pin accuracy at the discontinuity.
"""

import numpy as np
import jax.numpy as jnp

from flame_tpu.core.flame import Flame
from flame_tpu.geometry import se3, camera
from flame_tpu.io import synthetic
from flame_tpu.params import Params, DetectionParams, SolverParams

W, H, FX = 192, 144, 160.0
N_FRAMES = 20


def make_flame():
    params = Params(
        feature_capacity=1024, edge_capacity=4096, triangle_capacity=2048,
        poseframe_capacity=10, min_height=-100.0, max_height=100.0,
        idepth_init=0.2, idepth_var_init=0.25,
        detection=DetectionParams(win_size=12),
        solver=SolverParams(n_iters_per_frame=40, max_vertex_degree=16),
        debug_quiet=True)
    K = camera.make_k(FX, FX, W / 2, H / 2)
    return Flame(W, H, K, camera.inv_k(K), params), np.asarray(K)


def drive(fl, K, with_box, exposure_drift=0.0, noise_sigma=0.0):
    """Run the corridor sequence; returns (final truth idepth map,
    accumulated failure-counter dict)."""
    rng = np.random.default_rng(11)
    totals = {}
    truth = None
    for i in range(N_FRAMES):
        q, t = synthetic.trajectory(i)
        gain = 1.0 + exposure_drift * np.sin(i / 4.0)
        bias = 8.0 * exposure_drift * np.sin(i / 3.0)
        img, truth = synthetic.render_frame(
            K, q, t, W, H, with_box=with_box, exposure_gain=gain,
            exposure_bias=bias, noise_sigma=noise_sigma, noise_rng=rng)
        fl.update(i * 0.1, i, (jnp.asarray(q, jnp.float32),
                               jnp.asarray(t, jnp.float32)),
                  img.astype(np.float32), i % 2 == 0)
        if fl.inited:
            for k, v in fl.failure_stats().items():
                totals[k] = totals.get(k, 0) + v
    return truth, totals


def _box_masks(truth):
    """Pixel masks of the occluder (near) and its surrounding background
    (far), from the true idepth: the box front sits >= 1 m closer than
    anything behind it."""
    near = truth > 0.9 / (synthetic._BOX_Z[0] -
                          synthetic.trajectory(N_FRAMES - 1)[1][2])
    # Background ring: dilate the box mask and subtract it.
    pad = 14
    dil = np.zeros_like(near)
    ys, xs = np.nonzero(near)
    if ys.size:
        y0, y1 = max(ys.min() - pad, 0), min(ys.max() + pad, truth.shape[0])
        x0, x1 = max(xs.min() - pad, 0), min(xs.max() + pad, truth.shape[1])
        dil[y0:y1, x0:x1] = True
    ring = dil & ~near
    return near, ring


def test_occluder_discontinuity_and_outlier_machinery():
    fl, K = make_flame()
    truth, totals = drive(fl, K, with_box=True)
    est = fl.get_inverse_depth_map()
    ok = ~np.isnan(est) & ~np.isnan(truth)
    assert ok.mean() > 0.4, ok.mean()

    # Regression pin: overall accuracy with the occluder in the scene.
    rel = np.abs(est[ok] - truth[ok]) / truth[ok]
    assert np.median(rel) < 0.08, np.median(rel)

    # The depth discontinuity must survive smoothing: estimated idepth on
    # the box face vs its background ring reproduces the true contrast.
    near, ring = _box_masks(truth)
    near_ok = near & ok
    ring_ok = ring & ok
    assert near_ok.sum() > 50 and ring_ok.sum() > 100, \
        (near_ok.sum(), ring_ok.sum())
    c_true = np.median(truth[near_ok]) - np.median(truth[ring_ok])
    c_est = np.median(est[near_ok]) - np.median(est[ring_ok])
    assert c_true > 0.1  # the scene really has a discontinuity here
    assert c_est > 0.6 * c_true, (c_est, c_true)
    # Accuracy ON the discontinuity object itself.
    rel_near = np.abs(est[near_ok] - truth[near_ok]) / truth[near_ok]
    assert np.median(rel_near) < 0.1, np.median(rel_near)

    # Occlusion fires the failure machinery with NO photometric noise:
    # wall features disappearing behind the box must show up as failed
    # searches / chi^2 rejections / dropouts.
    fails = (totals.get("fail_max_cost", 0)
             + totals.get("fail_ambiguous_match", 0)
             + totals.get("fail_max_dropouts", 0)
             + totals.get("fail_max_var", 0))
    assert fails > 0, totals

    # The oblique-triangle filter must reject some triangles at the
    # discontinuity (reference flame.cc:2207-2283).
    tv = np.asarray(fl._tri_validity)[: fl._n_tris]
    assert fl._n_tris > 50
    assert (~tv).sum() > 0, "no triangles filtered at a discontinuity"


def test_photometric_stress_degrades_gracefully():
    """Exposure drift + sensor noise: the SSD max-cost and ambiguity
    gates must fire (non-zero failure counters), dropouts must kill some
    features, and the map must still form with bounded error."""
    fl, K = make_flame()
    truth, totals = drive(fl, K, with_box=True, exposure_drift=0.15,
                          noise_sigma=6.0)
    est = fl.get_inverse_depth_map()
    ok = ~np.isnan(est) & ~np.isnan(truth)
    assert ok.mean() > 0.25, ok.mean()
    rel = np.abs(est[ok] - truth[ok]) / truth[ok]
    assert np.median(rel) < 0.12, np.median(rel)

    # The photometric gates must actually reject matches under this
    # stress (cost gate or ambiguity gate), and some features must die.
    assert totals.get("fail_max_cost", 0) \
        + totals.get("fail_ambiguous_match", 0) > 0, totals
    assert totals.get("fail_max_dropouts", 0) \
        + totals.get("fail_max_var", 0) > 0, totals
    # More failures than the clean run of the same scene.
    _, clean_totals = drive(make_flame()[0], K, with_box=True)

    def fail_sum(d):
        return sum(v for k, v in d.items() if k.startswith("fail_"))
    assert fail_sum(totals) > fail_sum(clean_totals), \
        (fail_sum(totals), fail_sum(clean_totals))


def drive_tex(fl, K, **render_kw):
    """Run the corridor sequence with texture-pathology knobs; returns
    (final truth idepth map, accumulated failure-counter dict)."""
    totals = {}
    truth = None
    for i in range(N_FRAMES):
        q, t = synthetic.trajectory(i)
        img, truth = synthetic.render_frame(K, q, t, W, H, **render_kw)
        fl.update(i * 0.1, i, (jnp.asarray(q, jnp.float32),
                               jnp.asarray(t, jnp.float32)),
                  img.astype(np.float32), i % 2 == 0)
        if fl.inited:
            for k, v in fl.failure_stats().items():
                totals[k] = totals.get(k, 0) + v
    return truth, totals


def test_textureless_region_yields_no_features_and_interpolates():
    """VERDICT r3 #4a: a texture-free wall patch. The detection grid must
    yield NO features inside it (zero gradient < min_grad_mag, reference
    flame.cc:1216-1251 semantics), the mesh must INTERPOLATE across it
    (coverage holds), and depth error must stay bounded (the wall is
    planar, so interpolation is geometrically correct)."""
    fl, K = make_flame()
    truth, _ = drive_tex(fl, K, with_flat_patch=True)

    q, t = synthetic.trajectory(N_FRAMES - 1)
    patch = synthetic.wall_patch_mask(
        K, q, t, W, H, 0, synthetic._RIGHT_X,
        1, synthetic._FLAT_PATCH_Y, 2, synthetic._FLAT_PATCH_Z)
    # Erode by the detection cell size: a grid cell straddling the patch
    # border may legitimately take a winner from its textured half.
    win = fl.params.detection.win_size
    er = np.zeros_like(patch)
    er[win:-win, win:-win] = patch[win:-win, win:-win]
    for s in range(1, win + 1):
        er[win:-win, win:-win] &= (
            patch[win - s:-win - s, win:-win]
            & patch[win + s:H - win + s, win:-win]
            & patch[win:-win, win - s:-win - s]
            & patch[win:-win, win + s:W - win + s])
    assert er.sum() > 400, er.sum()  # the patch really is in view

    # 1. No detected features inside the eroded patch.
    verts, _, _ = fl.get_raw_idepths()
    if verts.shape[0]:
        xi = np.clip(np.round(verts[:, 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(verts[:, 1]).astype(int), 0, H - 1)
        n_inside = int(er[yi, xi].sum())
        assert n_inside == 0, f"{n_inside} features in the flat patch"

    # 2. The mesh interpolates ACROSS the patch: dense coverage there.
    est = fl.get_inverse_depth_map()
    cov_patch = np.mean(~np.isnan(est[er]))
    assert cov_patch > 0.5, cov_patch

    # 3. ... and does not hallucinate: interpolated depth error bounded.
    ok = er & ~np.isnan(est) & ~np.isnan(truth)
    rel = np.abs(est[ok] - truth[ok]) / truth[ok]
    assert np.median(rel) < 0.1, np.median(rel)


def _picket_fence(K, cam_x, width, height, plane_z, band_px,
                  period_m=0.2, seed=5):
    """Fronto-parallel plane at plane_z under lateral translation: the
    central band_px columns carry a PURE vertical sinusoid (period
    period_m meters, ~fx*period_m/plane_z px); the rest is fractal
    texture. Horizontal epilines cross the stripes — the textbook
    repetitive-texture pathology. Returns (uint8 img, truth idepth)."""
    fx = K[0, 0]
    cx, cy = K[0, 2], K[1, 2]
    vv, uu = np.mgrid[0:height, 0:width].astype(np.float64)
    X = (uu - cx) * plane_z / fx + cam_x
    Y = (vv - cy) * plane_z / fx
    tex = synthetic._fractal_texture(X, Y, seed, base_scale=1.8)
    stripes = 128.0 + 60.0 * np.sin(2.0 * np.pi * X / period_m)
    in_band = np.abs(uu - cx) < band_px / 2
    img = np.where(in_band, stripes, tex)
    truth = np.full((height, width), 1.0 / plane_z, np.float32)
    return np.clip(img, 0, 255).astype(np.uint8), truth


def test_repetitive_texture_fires_ambiguity_gate():
    """VERDICT r3 #4b: periodic texture produces repeated near-identical
    SSD minima along the epipolar search line. The second-best ambiguity
    gate (reference line_stereo.h:273-283) must FIRE — far more ambiguous
    rejections than the same scene with fractal texture — rather than
    return confident wrong matches: depth error inside the striped band
    must NOT show period-size wrong-lobe locks."""
    PLANE_Z = 3.0
    BAND = 72  # px; ~11 detection columns of pure stripes

    def run(band_px):
        fl, K = make_flame()
        totals = {}
        for i in range(N_FRAMES):
            cam_x = 0.12 * i  # lateral: epilines horizontal
            img, truth = _picket_fence(K, cam_x, W, H, PLANE_Z, band_px)
            q = np.array([1.0, 0.0, 0.0, 0.0])
            t = np.array([cam_x, 0.0, 0.0])
            fl.update(i * 0.1, i, (jnp.asarray(q, jnp.float32),
                                   jnp.asarray(t, jnp.float32)),
                      img.astype(np.float32), i % 2 == 0)
            if fl.inited:
                for k, v in fl.failure_stats().items():
                    totals[k] = totals.get(k, 0) + v
        return fl, totals

    fl, totals = run(BAND)
    _, clean_totals = run(0)

    amb = totals.get("fail_ambiguous_match", 0)
    amb_clean = clean_totals.get("fail_ambiguous_match", 0)
    assert amb > max(2 * amb_clean, 20), (amb, amb_clean)

    # No confident wrong matches: any estimate surviving inside the
    # band must be accurate (a wrong-lobe lock at period 0.2 m / 3 m
    # depth is a ~6-7% idepth error per lobe; gate on well below one
    # lobe). Outside the band the map must be dense and accurate.
    est = fl.get_inverse_depth_map()
    ok = ~np.isnan(est)
    assert ok.mean() > 0.3, ok.mean()
    rel = np.abs(est - 1.0 / PLANE_Z) * PLANE_Z
    assert np.median(rel[ok]) < 0.05, np.median(rel[ok])
    in_band = np.abs(np.arange(W)[None, :] - W / 2) < BAND / 2
    band_ok = ok & in_band
    if band_ok.sum() > 50:
        assert np.median(rel[band_ok]) < 0.04, np.median(rel[band_ok])
