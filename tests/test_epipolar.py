"""Epipolar geometry tests.

Closed-form cases mirror the reference's test strategy
(/root/reference/test/stereo/epipolar_geometry_test.cc): axis translations,
yaw/roll rotations, two real-data pose fixtures with hardcoded expected
pixels, and disparity <-> inverse-depth round trips.
"""

import numpy as np
import jax
import jax.numpy as jnp

from flame_tpu.geometry import se3, camera, epipolar


def make_K(fx=525.0, fy=525.0, cx=320.0, cy=240.0):
    K = camera.make_k(fx, fy, cx, cy)
    return K, camera.inv_k(K)


def quat_wxyz(w, x, y, z):
    return se3.quat_normalize(jnp.array([w, x, y, z], dtype=jnp.float32))


def quat_about_y(angle):
    return jnp.array([np.cos(angle / 2), 0.0, np.sin(angle / 2), 0.0],
                     dtype=jnp.float32)


def quat_about_x(angle):
    return jnp.array([np.cos(angle / 2), np.sin(angle / 2), 0.0, 0.0],
                     dtype=jnp.float32)


def test_min_depth_projection_x_translate():
    K, Kinv = make_K()
    u_ref = jnp.array([320.0, 240.0])

    geo = epipolar.load(K, Kinv, se3.quat_identity(), jnp.array([2.0, 0, 0]))
    u_min = np.asarray(epipolar.min_depth_projection(geo, u_ref))
    assert u_min[0] > 2 * 320
    np.testing.assert_allclose(u_min[1], 240.0, atol=1e-3)

    geo = epipolar.load(K, Kinv, se3.quat_identity(), jnp.array([-2.0, 0, 0]))
    u_min = np.asarray(epipolar.min_depth_projection(geo, u_ref))
    assert u_min[0] < 0
    np.testing.assert_allclose(u_min[1], 240.0, atol=1e-3)


def test_min_depth_projection_y_translate():
    K, Kinv = make_K()
    u_ref = jnp.array([320.0, 240.0])

    geo = epipolar.load(K, Kinv, se3.quat_identity(), jnp.array([0.0, 2.0, 0]))
    u_min = np.asarray(epipolar.min_depth_projection(geo, u_ref))
    assert u_min[1] > 2 * 240
    np.testing.assert_allclose(u_min[0], 320.0, atol=1e-3)


def test_min_depth_projection_z_translate():
    # Positive z translation: min-depth projection is the epipole.
    K, Kinv = make_K()
    u_ref = jnp.array([100.0, 100.0])
    geo = epipolar.load(K, Kinv, se3.quat_identity(), jnp.array([0.0, 0.0, 2.0]))
    u_min = np.asarray(epipolar.min_depth_projection(geo, u_ref))
    np.testing.assert_allclose(u_min, [320.0, 240.0], atol=1e-3)


def test_min_depth_projection_real_data_ref_front_cmp():
    """Reference fixture: epipolar_geometry_test.cc:202-220 (tz > 0)."""
    K = camera.make_k(535.43310546875, 539.212524414062,
                      320.106652814575, 247.632132204719)
    Kinv = camera.inv_k(K)
    q = quat_wxyz(0.999138, -0.000878, 0.041493, 0.000386)
    t = jnp.array([-0.221092, -0.036134, 0.084099])
    geo = epipolar.load(K, Kinv, q, t)
    u_min = np.asarray(epipolar.min_depth_projection(
        geo, jnp.array([320.0, 240.0])))
    np.testing.assert_allclose(u_min, [-1087.525391, 15.954912], atol=1e-2)


def test_min_depth_projection_real_data_ref_behind_cmp():
    """Reference fixture: epipolar_geometry_test.cc:224-244 (tz < 0)."""
    K = camera.make_k(535.43310546875, 539.212524414062,
                      320.106652814575, 247.632132204719)
    Kinv = camera.inv_k(K)
    q = quat_wxyz(-0.999853, 0.014856, -0.005249, -0.006822)
    t = jnp.array([-0.258187, 0.040849, -0.054990])
    geo = epipolar.load(K, Kinv, q, t)
    u_min = np.asarray(epipolar.min_depth_projection(
        geo, jnp.array([320.0, 240.0])))
    np.testing.assert_allclose(u_min, [187.65597534179688, 278.55392456054688],
                               atol=1e-1)


def test_max_depth_projection_identity():
    K, Kinv = make_K()
    geo = epipolar.load(K, Kinv, se3.quat_identity(), jnp.zeros(3))
    u = np.asarray(epipolar.max_depth_projection(geo, jnp.array([320.0, 240.0])))
    np.testing.assert_allclose(u, [320.0, 240.0], atol=1e-3)


def test_max_depth_projection_30_yaw():
    """Reference fixture: epipolar_geometry_test.cc:270-290."""
    K, Kinv = make_K()
    geo = epipolar.load(K, Kinv, quat_about_y(-np.pi / 6), jnp.zeros(3))
    u = np.asarray(epipolar.max_depth_projection(geo, jnp.array([320.0, 240.0])))
    np.testing.assert_allclose(u, [16.891090393066406, 240.0], atol=1e-3)


def test_max_depth_projection_30_roll():
    """Reference fixture: epipolar_geometry_test.cc:294-314."""
    K, Kinv = make_K()
    geo = epipolar.load(K, Kinv, quat_about_x(-np.pi / 6), jnp.zeros(3))
    u = np.asarray(epipolar.max_depth_projection(geo, jnp.array([320.0, 240.0])))
    np.testing.assert_allclose(u, [320.0, 543.10888671875], atol=1e-3)


def test_epiline_60_yaw():
    """Reference fixture: epipolar_geometry_test.cc:316-339."""
    K, Kinv = make_K()
    q_rl = quat_about_y(-np.pi / 3)
    t_rl = jnp.array([2.0, 0.0, 0.0])
    q_lr = se3.quat_conj(q_rl)
    t_lr = -se3.quat_rotate(q_rl, t_rl)
    geo = epipolar.load(K, Kinv, q_lr, t_lr)
    _, epi = epipolar.epiline(geo, jnp.array([320.0, 240.0]))
    np.testing.assert_allclose(np.asarray(epi), [1.0, 0.0], atol=1e-4)


def test_epiline_60_roll():
    """Reference fixture: epipolar_geometry_test.cc:341-364."""
    K, Kinv = make_K()
    q_rl = quat_about_x(np.pi / 3)
    t_rl = jnp.array([0.0, 2.0, 0.0])
    q_lr = se3.quat_conj(q_rl)
    t_lr = -se3.quat_rotate(q_rl, t_rl)
    geo = epipolar.load(K, Kinv, q_lr, t_lr)
    _, epi = epipolar.epiline(geo, jnp.array([320.0, 240.0]))
    np.testing.assert_allclose(np.asarray(epi), [0.0, 1.0], atol=1e-4)


def _project_world(K, T_world, p_world):
    """Project world point into a camera with world pose T_world."""
    p_cam = se3.act(se3.inverse(T_world), p_world)
    return camera.project(K, p_cam)


def test_disparity_to_idepth_round_trip():
    """Two cameras, one landmark: recovered inverse depth must match geometry
    (the reference's disparityToDepthTest family, :370-771)."""
    K, Kinv = make_K()
    T1 = (quat_about_y(-np.pi / 12), jnp.zeros(3))
    T2 = (se3.quat_identity(), jnp.array([1.0, 0.0, 0.0]))
    p_world = jnp.array([1.0, 0.0, 10.0])

    u1 = _project_world(K, T1, p_world)
    u2 = _project_world(K, T2, p_world)

    # Depth of p in camera 1.
    depth1 = float(se3.act(se3.inverse(T1), p_world)[2])

    # Geometry from ref=1 to cmp=2.
    geo = epipolar.load_relative(K, Kinv, T1, T2)
    disp, u_inf, epi = epipolar.disparity(geo, u1, u2)
    assert float(disp) > 0
    idepth = float(epipolar.disparity_to_idepth(geo, u1, u_inf, epi, disp))
    np.testing.assert_allclose(idepth, 1.0 / depth1, rtol=1e-3)
    depth = float(epipolar.disparity_to_depth(geo, u1, u_inf, epi, disp))
    np.testing.assert_allclose(depth, depth1, rtol=1e-3)


def test_project_idepth_consistency():
    """project_idepth must agree with direct world-point projection."""
    K, Kinv = make_K()
    T_ref = (quat_about_y(0.1), jnp.array([0.0, 0.2, 0.0]))
    T_cmp = (quat_about_x(-0.05), jnp.array([0.5, 0.0, 0.1]))
    p_world = jnp.array([0.3, -0.2, 5.0])

    u_ref = _project_world(K, T_ref, p_world)
    u_cmp_direct = _project_world(K, T_cmp, p_world)
    depth_ref = float(se3.act(se3.inverse(T_ref), p_world)[2])
    depth_cmp = float(se3.act(se3.inverse(T_cmp), p_world)[2])

    geo = epipolar.load_relative(K, Kinv, T_ref, T_cmp)
    u_cmp, new_idepth = epipolar.project_idepth(geo, u_ref, 1.0 / depth_ref)
    np.testing.assert_allclose(np.asarray(u_cmp), np.asarray(u_cmp_direct),
                               atol=1e-3)
    np.testing.assert_allclose(float(new_idepth), 1.0 / depth_cmp, rtol=1e-4)


def test_project_idepth_zero_maps_to_infinite():
    K, Kinv = make_K()
    geo = epipolar.load(K, Kinv, quat_about_y(0.2), jnp.array([1.0, 0.0, 0.0]))
    u_ref = jnp.array([100.0, 150.0])
    u_cmp, idn = epipolar.project_idepth(geo, u_ref, 0.0)
    u_inf = epipolar.max_depth_projection(geo, u_ref)
    np.testing.assert_allclose(np.asarray(u_cmp), np.asarray(u_inf), atol=1e-4)
    assert float(idn) == 0.0


def test_reference_epiline_translation_only():
    # Pure +x translation of cmp camera: ref epiline is +/-x.
    K, Kinv = make_K()
    geo = epipolar.load(K, Kinv, se3.quat_identity(), jnp.array([1.0, 0.0, 0.0]))
    epi = np.asarray(epipolar.reference_epiline(geo, jnp.array([250.0, 111.0])))
    np.testing.assert_allclose(np.abs(epi), [1.0, 0.0], atol=1e-5)


def test_batched_queries(rng):
    """All query functions broadcast over feature batches."""
    K, Kinv = make_K()
    geo = epipolar.load(K, Kinv, quat_about_y(0.05),
                        jnp.array([0.3, 0.1, 0.02]))
    u = jnp.asarray(rng.uniform(50, 400, size=(128, 2)).astype(np.float32))
    ids = jnp.asarray(rng.uniform(0.1, 1.0, size=128).astype(np.float32))

    u_cmp, idn = epipolar.project_idepth(geo, u, ids)
    assert u_cmp.shape == (128, 2) and idn.shape == (128,)
    u_inf, epi = epipolar.epiline(geo, u)
    assert u_inf.shape == (128, 2) and epi.shape == (128, 2)
    d, _, _ = epipolar.disparity(geo, u, u_cmp)
    assert d.shape == (128,)
    # Unit epilines.
    np.testing.assert_allclose(np.linalg.norm(np.asarray(epi), axis=-1), 1.0,
                               atol=1e-5)


def test_compose_matches_direct_load():
    """epipolar.compose (chained KRKinv/Kt instead of a fresh K R Kinv
    build) must match load() on the composed relative pose."""
    import numpy as np
    from flame_tpu.geometry import se3

    rng = np.random.default_rng(3)
    K = camera.make_k(525.0, 520.0, 320.0, 240.0)
    Kinv = camera.inv_k(K)

    def rand_pose():
        q = rng.normal(size=4)
        q = jnp.asarray(q / np.linalg.norm(q), jnp.float32)
        return q, jnp.asarray(rng.normal(size=3) * 0.5, jnp.float32)

    # Batched ref->cmp geometries + one cmp->cmp2.
    q1 = []
    t1 = []
    for _ in range(5):
        q, t = rand_pose()
        q1.append(q)
        t1.append(t)
    q1 = jnp.stack(q1)
    t1 = jnp.stack(t1)
    geos = jax.vmap(epipolar.load, in_axes=(None, None, 0, 0))(
        K, Kinv, q1, t1)
    q2, t2 = rand_pose()
    geo2 = epipolar.load(K, Kinv, q2, t2)

    out = epipolar.compose(geo2, geos)
    for i in range(5):
        qc = se3.quat_mul(q2, q1[i])
        tc = se3.quat_rotate(q2, t1[i]) + t2
        ref = epipolar.load(K, Kinv, qc, tc)
        for f in ("KRKinv", "Kt", "t_ref_to_cmp", "t_cmp_to_ref",
                  "epipole"):
            a = np.asarray(getattr(ref, f))
            b = np.asarray(getattr(out, f))[i]
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-4,
                                       err_msg=f)
        # Quaternion up to sign.
        qa = np.asarray(ref.q_ref_to_cmp)
        qb = np.asarray(out.q_ref_to_cmp)[i]
        assert min(np.abs(qb - qa).max(), np.abs(qb + qa).max()) < 1e-5
