"""SE(3) unit tests: group axioms, exp/log round trips, matrix conversions."""

import numpy as np
import jax.numpy as jnp

from flame_tpu.geometry import se3


def random_quat(rng, n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.normal(size=shape).astype(np.float32)
    return np.asarray(se3.quat_normalize(jnp.asarray(q)))


def test_quat_mul_identity(rng):
    q = random_quat(rng)
    e = se3.quat_identity()
    np.testing.assert_allclose(se3.quat_mul(e, q), q, atol=1e-6)
    np.testing.assert_allclose(se3.quat_mul(q, e), q, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, 32)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    R = se3.quat_to_matrix(jnp.asarray(q))
    rv_mat = np.einsum("nij,nj->ni", np.asarray(R), v)
    rv_quat = np.asarray(se3.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(rv_quat, rv_mat, atol=1e-5)


def test_quat_matrix_round_trip(rng):
    q = random_quat(rng, 64)
    # Fix hemisphere: quat_from_matrix returns w >= 0 representative.
    q = np.where(q[:, :1] < 0, -q, q)
    R = se3.quat_to_matrix(jnp.asarray(q))
    q2 = np.asarray(se3.quat_from_matrix(R))
    q2 = np.where(q2[:, :1] < 0, -q2, q2)
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_se3_mul_inverse(rng):
    qa = random_quat(rng)
    ta = rng.normal(size=3).astype(np.float32)
    T = (jnp.asarray(qa), jnp.asarray(ta))
    TinvT = se3.mul(se3.inverse(T), T)
    np.testing.assert_allclose(np.abs(np.asarray(TinvT[0]))[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(TinvT[1]), 0.0, atol=1e-5)


def test_se3_act_matches_matrix(rng):
    q = random_quat(rng)
    t = rng.normal(size=3).astype(np.float32)
    T = (jnp.asarray(q), jnp.asarray(t))
    p = rng.normal(size=(16, 3)).astype(np.float32)
    M = np.asarray(se3.to_matrix(T))
    expected = (M[:3, :3] @ p.T).T + M[:3, 3]
    np.testing.assert_allclose(np.asarray(se3.act(T, jnp.asarray(p))),
                               expected, atol=1e-5)


def test_exp_log_round_trip(rng):
    xi = 0.5 * rng.normal(size=(64, 6)).astype(np.float32)
    T = se3.exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_exp_small_angle(rng):
    xi = 1e-8 * rng.normal(size=(8, 6)).astype(np.float32)
    q, t = se3.exp(jnp.asarray(xi))
    np.testing.assert_allclose(np.asarray(q)[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), xi[:, :3], atol=1e-6)


def test_exp_pure_translation():
    xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    q, t = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(t), [1, 2, 3], atol=1e-7)


def test_log_matches_known_rotation():
    # 90 degrees about z.
    angle = np.pi / 2
    q = jnp.array([np.cos(angle / 2), 0.0, 0.0, np.sin(angle / 2)],
                  dtype=jnp.float32)
    t = jnp.zeros(3)
    xi = np.asarray(se3.log((q, t)))
    np.testing.assert_allclose(xi[3:], [0, 0, angle], atol=1e-5)


def test_rotation_angle():
    angle = 0.7
    q = jnp.array([np.cos(angle / 2), np.sin(angle / 2), 0.0, 0.0])
    assert abs(float(se3.rotation_angle(q)) - angle) < 1e-6
    # Same rotation, negated quaternion.
    assert abs(float(se3.rotation_angle(-q)) - angle) < 1e-6


def test_log_small_angle_f32_stable():
    """Regression: log() of a near-identity transform must not blow up.
    The direct V^-1 coefficient contains 1-cos(theta), which loses all f32
    mantissa bits below theta ~ 3e-4 (this once produced 1e12 pose-prior
    residuals in BA)."""
    for eps in (1e-3, 3e-4, 1e-4, 1e-5, 1e-6):
        q = jnp.array([1.0, eps, eps / 2, -eps / 3])
        q = se3.quat_normalize(q)
        t = jnp.array([0.1, -0.05, 0.02])
        xi = np.asarray(se3.log((q, t)))
        assert np.all(np.abs(xi[:3]) < 1.0), (eps, xi)
        # Round trip.
        q2, t2 = se3.exp(jnp.asarray(xi))
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-5)


def test_exp_log_mid_angles(rng):
    """Angles around the series/direct switch point (0.03 rad)."""
    for scale in (0.01, 0.03, 0.05, 0.2):
        xi = scale * rng.normal(size=(16, 6)).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        xi2 = np.asarray(se3.log(T))
        np.testing.assert_allclose(xi2, xi, atol=5e-5)
