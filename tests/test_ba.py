"""Windowed bundle adjustment tests: synthetic recovery of perturbed poses
and inverse depths with known ground truth."""

import numpy as np
import jax.numpy as jnp

from flame_tpu.ba import residuals as resid
from flame_tpu.ba import schur
from flame_tpu.geometry import se3, camera
from flame_tpu.params import BAParams


def build_problem(rng, n_poses=4, n_lms=40, obs_per_lm=3,
                  pose_noise=0.01, lm_noise=0.05):
    K = camera.make_k(300.0, 300.0, 160.0, 120.0)
    Kinv = camera.inv_k(K)

    # Ground-truth poses along x with small rotations.
    q_true, t_true = [], []
    for i in range(n_poses):
        xi = np.zeros(6)
        xi[0] = 0.4 * i
        xi[4] = 0.02 * i  # slight yaw
        q, t = se3.exp(jnp.asarray(xi, jnp.float32))
        q_true.append(np.asarray(q))
        t_true.append(np.asarray(t))
    q_true = np.stack(q_true)
    t_true = np.stack(t_true)

    # Landmarks anchored in pose 0: pixels + true idepths.
    u_ref = rng.uniform([40, 40], [280, 200], size=(n_lms, 2)).astype(
        np.float32)
    depth = rng.uniform(2.0, 8.0, n_lms).astype(np.float32)
    d_true = 1.0 / depth

    # Observations: project into poses 1..P-1.
    arec, orec, lrec, urrec, uorec = [], [], [], [], []
    for l in range(n_lms):
        ray = np.asarray(camera.backproject(Kinv, jnp.asarray(u_ref[l])))
        p_w = np.asarray(se3.act((jnp.asarray(q_true[0]),
                                  jnp.asarray(t_true[0])),
                                 jnp.asarray(ray * depth[l])))
        for o in range(1, min(1 + obs_per_lm, n_poses)):
            p_o = np.asarray(se3.act(se3.inverse(
                (jnp.asarray(q_true[o]), jnp.asarray(t_true[o]))),
                jnp.asarray(p_w)))
            if p_o[2] <= 0.1:
                continue
            u = np.asarray(camera.project(jnp.asarray(K), jnp.asarray(p_o)))
            arec.append(0)
            orec.append(o)
            lrec.append(l)
            urrec.append(u_ref[l])
            uorec.append(u)

    M = len(arec)
    obs = resid.BAObservations(
        anchor_idx=jnp.asarray(np.array(arec, np.int32)),
        obs_idx=jnp.asarray(np.array(orec, np.int32)),
        lm_idx=jnp.asarray(np.array(lrec, np.int32)),
        u_ref=jnp.asarray(np.stack(urrec)),
        u_obs=jnp.asarray(np.stack(uorec)),
        valid=jnp.ones(M, bool))

    # Perturb non-fixed poses and landmark idepths.
    q_init = q_true.copy()
    t_init = t_true.copy()
    for i in range(2, n_poses):
        xi = rng.normal(size=6).astype(np.float32) * pose_noise
        q, t = se3.mul(se3.exp(jnp.asarray(xi)),
                       (jnp.asarray(q_true[i]), jnp.asarray(t_true[i])))
        q_init[i] = np.asarray(q)
        t_init[i] = np.asarray(t)
    d_init = d_true * (1 + lm_noise * rng.normal(size=n_lms).astype(
        np.float32))

    problem = schur.BAProblem(
        q=jnp.asarray(q_init), t=jnp.asarray(t_init),
        lm_idepth=jnp.asarray(d_init),
        lm_valid=jnp.ones(n_lms, bool), obs=obs)
    return K, Kinv, problem, (q_true, t_true, d_true)


def test_ba_recovers_truth(rng):
    K, Kinv, problem, (q_true, t_true, d_true) = build_problem(rng)
    params = BAParams(n_gn_iters=8, damping=1e-6, pose_prior_weight=0.0)

    c0 = float(schur.window_cost(params, K, Kinv, problem))
    q, t, lm, c1 = schur.solve_window(params, K, Kinv, problem, n_fixed=2)
    assert float(c1) < 1e-4 * max(c0, 1.0), f"cost {c0} -> {float(c1)}"

    t_err = np.linalg.norm(np.asarray(t) - t_true, axis=1)
    assert t_err.max() < 1e-3, t_err
    for i in range(len(q_true)):
        dq = se3.quat_mul(se3.quat_conj(jnp.asarray(q_true[i])),
                          jnp.asarray(np.asarray(q)[i]))
        assert float(se3.rotation_angle(dq)) < 1e-3

    d_rel = np.abs(np.asarray(lm) - d_true) / d_true
    assert np.median(d_rel) < 1e-3


def test_ba_fixed_poses_untouched(rng):
    K, Kinv, problem, _ = build_problem(rng)
    params = BAParams(n_gn_iters=4, pose_prior_weight=0.0)
    q, t, lm, _ = schur.solve_window(params, K, Kinv, problem, n_fixed=2)
    np.testing.assert_allclose(np.asarray(q)[:2], np.asarray(problem.q)[:2],
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(t)[:2], np.asarray(problem.t)[:2],
                               atol=1e-7)


def test_ba_huber_downweights_outliers(rng):
    K, Kinv, problem, (q_true, t_true, d_true) = build_problem(rng)
    # Corrupt 10% of observations grossly.
    u_obs = np.asarray(problem.obs.u_obs).copy()
    M = u_obs.shape[0]
    n_bad = M // 10
    u_obs[:n_bad] += rng.uniform(30, 60, size=(n_bad, 2))
    problem = problem._replace(obs=problem.obs._replace(
        u_obs=jnp.asarray(u_obs)))

    robust = BAParams(n_gn_iters=10, huber_delta=1.0, damping=1e-6, pose_prior_weight=0.0)
    q, t, lm, _ = schur.solve_window(robust, K, Kinv, problem, n_fixed=2)
    t_err_robust = np.linalg.norm(np.asarray(t) - t_true, axis=1).max()

    l2 = BAParams(n_gn_iters=10, huber_delta=1e6, damping=1e-6, pose_prior_weight=0.0)
    q2, t2, _, _ = schur.solve_window(l2, K, Kinv, problem, n_fixed=2)
    t_err_l2 = np.linalg.norm(np.asarray(t2) - t_true, axis=1).max()

    assert t_err_robust < 0.5 * t_err_l2, (t_err_robust, t_err_l2)
    assert t_err_robust < 2e-2


def test_ba_invalid_landmarks_frozen(rng):
    K, Kinv, problem, _ = build_problem(rng)
    lm_valid = np.asarray(problem.lm_valid).copy()
    lm_valid[:5] = False
    problem = problem._replace(lm_valid=jnp.asarray(lm_valid))
    params = BAParams(n_gn_iters=4, pose_prior_weight=0.0)
    _, _, lm, _ = schur.solve_window(params, K, Kinv, problem, n_fixed=2)
    np.testing.assert_allclose(np.asarray(lm)[:5],
                               np.asarray(problem.lm_idepth)[:5], atol=1e-7)


def test_ba_integrated_pipeline(rng):
    """Full pipeline with do_ba=True on exact poses: BA must run, converge
    to tiny cost, and not degrade the depth estimate."""
    import jax.numpy as jnp
    from flame_tpu.core.flame import Flame
    from test_flame_e2e import make_params, render, FX, W, H, TRUE_IDEPTH

    params = make_params().replace(do_ba=True)
    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    fl = Flame(W, H, K, Kinv, params)
    for i in range(12):
        cam_x = 0.15 * i
        pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
        fl.update(i * 0.1, i, pose, render(cam_x), i % 2 == 0)

    assert fl._ba is not None and fl._ba.last_cost is not None
    assert np.isfinite(fl._ba.last_cost)

    idm = fl.get_inverse_depth_map()
    err = np.abs(idm[~np.isnan(idm)] - TRUE_IDEPTH) / TRUE_IDEPTH
    assert np.median(err) < 0.1
    # Poses were exact; BA must not have dragged them away.
    for fid, slot in fl._pf_slot_by_id.items():
        t = np.asarray(fl._stack.t[slot])
        np.testing.assert_allclose(t, [0.15 * fid, 0, 0], atol=2e-2)
