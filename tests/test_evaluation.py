"""Evaluation metric tests + the noisy-pose BA trajectory study."""

import numpy as np
import jax.numpy as jnp

from flame_tpu.utils import evaluation as ev


def test_umeyama_recovers_transform(rng):
    src = rng.normal(size=(50, 3))
    ang = 0.4
    R_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    t_true = np.array([1.0, -2.0, 0.5])
    s_true = 1.7
    dst = (s_true * (R_true @ src.T)).T + t_true
    R, t, s = ev.umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(R, R_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    np.testing.assert_allclose(s, s_true, atol=1e-8)


def test_ate_zero_for_rigidly_moved_trajectory(rng):
    gt = rng.normal(size=(30, 3))
    ang = 0.2
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    est = (R @ gt.T).T + np.array([5.0, 1.0, -3.0])
    assert ev.ate_rmse(est, gt, align=True) < 1e-9
    assert ev.ate_rmse(est, gt, align=False) > 1.0


def test_depth_error_stats():
    gt = np.full((10, 10), 0.5)
    est = gt.copy()
    est[0, 0] = np.nan
    est[5, 5] = 0.6
    out = ev.depth_error_stats(est, gt)
    assert abs(out["coverage"] - 0.99) < 1e-9
    assert out["median_rel"] == 0.0
    assert 0 < out["mean_rel"] < 0.01


def test_pose_errors():
    q = np.tile([1.0, 0, 0, 0], (5, 1))
    t = np.zeros((5, 3))
    ang = np.radians(2.0)
    q2 = np.tile([np.cos(ang / 2), np.sin(ang / 2), 0, 0], (5, 1))
    t2 = np.full((5, 3), 0.01)
    out = ev.pose_errors(q2, t2, q, t)
    np.testing.assert_allclose(out["r_max_deg"], 2.0, atol=1e-6)
    np.testing.assert_allclose(out["t_max"], np.sqrt(3) * 0.01, atol=1e-9)


def test_ba_improves_noisy_trajectory(rng):
    """Feed the pipeline poses corrupted with noise; windowed BA (with a
    soft prior) must not worsen — and should reduce — the trajectory error
    relative to the injected noise."""
    from flame_tpu.core.flame import Flame
    from flame_tpu.geometry import se3, camera
    from flame_tpu.params import BAParams
    from test_flame_e2e import make_params, render, FX, W, H

    params = make_params().replace(
        do_ba=True,
        ba=BAParams(n_gn_iters=6, pose_prior_weight=3e2, huber_delta=2.0,
                    window_size=8))
    K = camera.make_k(FX, FX, W / 2, H / 2)
    fl = Flame(W, H, K, camera.inv_k(K), params)

    n = 16
    gt_t = np.stack([0.15 * np.arange(n), np.zeros(n), np.zeros(n)], 1)
    noise = np.zeros((n, 3))
    # Noise on later poseframes only (first two anchor the gauge).
    noise[6:] = rng.normal(size=(n - 6, 3)) * 0.008
    for i in range(n):
        pose = (se3.quat_identity(),
                jnp.asarray((gt_t[i] + noise[i]).astype(np.float32)))
        fl.update(i * 0.1, i, pose, render(0.15 * i), i % 2 == 0)

    # Compare refined poseframe poses against ground truth.
    ids = sorted(fl._pf_slot_by_id)
    est = np.stack([np.asarray(fl._stack.t[fl._pf_slot_by_id[f]])
                    for f in ids])
    gt = gt_t[ids]
    noisy = gt + noise[ids]
    ate_in = ev.ate_rmse(noisy, gt, align=False)
    ate_out = ev.ate_rmse(est, gt, align=False)
    # BA must not blow up the trajectory, and should recover some of the
    # injected noise (matches are epipolar-correlated with the noisy
    # poses, so full recovery is not expected).
    assert ate_out < ate_in * 1.05, (ate_in, ate_out)


def test_ba_rematch_improves_corner_scene(rng):
    """On a corner-rich texture the 2-D observation re-matching
    (ba/rematch.py) must restore enough perpendicular residual for the
    windowed BA to recover a solid fraction of injected pose noise —
    epipolar-only matches leave it nearly blind (ratio ~1.0)."""
    from flame_tpu.core.flame import Flame
    from flame_tpu.geometry import se3, camera
    from flame_tpu.params import BAParams
    from test_flame_e2e import make_params, FX, W, H

    PLANE_Z = 5.0

    def render2(cam_x):
        vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)
        X = (uu - W / 2) * PLANE_Z / FX + cam_x
        Y = (vv - H / 2) * PLANE_Z / FX
        return (128 + 45 * np.sin(4.1 * X) * np.sin(4.3 * Y)
                + 35 * np.sin(9.7 * X + 0.3) * np.sin(8.9 * Y + 1.1)
                + 20 * np.sin(2.3 * X + 0.7) * np.sin(2.9 * Y + 0.2)
                ).astype(np.float32)

    params = make_params().replace(
        do_ba=True,
        ba=BAParams(n_gn_iters=6, pose_prior_weight=3e2, window_size=8))
    K = camera.make_k(FX, FX, W / 2, H / 2)
    fl = Flame(W, H, K, camera.inv_k(K), params)

    n = 16
    gt_t = np.stack([0.15 * np.arange(n), np.zeros(n), np.zeros(n)], 1)
    noise = np.zeros((n, 3))
    noise[6:] = rng.normal(size=(n - 6, 3)) * 0.008
    for i in range(n):
        pose = (se3.quat_identity(),
                jnp.asarray((gt_t[i] + noise[i]).astype(np.float32)))
        fl.update(i * 0.1, i, pose, render2(0.15 * i), i % 2 == 0)

    ids = sorted(fl._pf_slot_by_id)
    est = np.stack([np.asarray(fl._stack.t[fl._pf_slot_by_id[f]])
                    for f in ids])
    gt = gt_t[ids]
    noisy = gt + noise[ids]
    ate_in = ev.ate_rmse(noisy, gt, align=False)
    ate_out = ev.ate_rmse(est, gt, align=False)
    assert ate_out < 0.9 * ate_in, (ate_in, ate_out)
