"""2-D observation re-matching + structure-tensor weights (ba/rematch)."""

import numpy as np
import jax.numpy as jnp

from flame_tpu.ba import rematch
from flame_tpu.geometry import se3, camera


def _checker(H, W, period=8):
    yy, xx = np.mgrid[0:H, 0:W]
    return (128 + 90 * np.sin(2 * np.pi * xx / period)
            * np.sin(2 * np.pi * yy / period)).astype(np.float32)


def test_rematch_recovers_known_shift():
    """Identical poses + zero idepth => u_pred == u_ref; matches must land
    on the true correspondence of a translated corner-rich image."""
    H, W, pad = 64, 96, 8
    img0 = _checker(H, W)
    shift = 2  # integer pixel shift of the observed image
    img1 = np.roll(img0, shift, axis=1)
    imgs = np.stack([np.pad(img0, pad, mode="reflect"),
                     np.pad(img1, pad, mode="reflect")])

    K = camera.make_k(100.0, 100.0, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    qw = jnp.tile(se3.quat_identity(), (2, 1))
    tw = jnp.zeros((2, 3))

    M = 16
    rng = np.random.default_rng(0)
    u_ref = rng.uniform(20, 60, (M, 2)).astype(np.float32)
    # Pick TRUE 2-D corners of the checker (structure tensor peaks).
    u_ref = (np.round(u_ref / 4) * 4 + 2).astype(np.float32)

    u_out, refined = rematch.rematch_observations(
        K, Kinv, jnp.asarray(imgs), pad, qw, tw,
        jnp.zeros(M, jnp.int32), jnp.ones(M, jnp.int32),
        jnp.zeros(M, jnp.int32), jnp.ones(M, jnp.int32),
        jnp.asarray(u_ref), jnp.asarray(u_ref),
        jnp.zeros(M, jnp.int32), jnp.zeros((1,), jnp.float32),
        jnp.ones(M, bool), radius=3, min_eig=200.0)

    refined = np.asarray(refined)
    assert refined.sum() >= M // 2, refined.sum()
    err = np.abs(np.asarray(u_out)[refined]
                 - (u_ref[refined] + [shift, 0.0]))
    assert err.max() < 0.35, err.max()


def test_rematch_gates_edges():
    """On a pure vertical-edge image the aperture gate must reject every
    re-match (the along-edge position is unobservable)."""
    H, W, pad = 64, 96, 8
    yy, xx = np.mgrid[0:H, 0:W]
    img = (128 + 90 * np.sin(2 * np.pi * xx / 8)).astype(np.float32)
    imgs = np.stack([np.pad(img, pad, mode="reflect")] * 2)

    K = camera.make_k(100.0, 100.0, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    qw = jnp.tile(se3.quat_identity(), (2, 1))
    tw = jnp.zeros((2, 3))
    M = 8
    u_ref = np.linspace([20, 20], [60, 50], M).astype(np.float32)

    _, refined = rematch.rematch_observations(
        K, Kinv, jnp.asarray(imgs), pad, qw, tw,
        jnp.zeros(M, jnp.int32), jnp.ones(M, jnp.int32),
        jnp.zeros(M, jnp.int32), jnp.ones(M, jnp.int32),
        jnp.asarray(u_ref), jnp.asarray(u_ref),
        jnp.zeros(M, jnp.int32), jnp.zeros((1,), jnp.float32),
        jnp.ones(M, bool), min_eig=200.0)
    assert not np.asarray(refined).any()


def test_observation_weights_edge_vs_corner():
    H, W, pad = 64, 96, 8
    yy, xx = np.mgrid[0:H, 0:W]
    edge = (128 + 90 * np.sin(2 * np.pi * xx / 8)).astype(np.float32)
    corner = _checker(H, W)
    imgs = np.stack([np.pad(edge, pad, "reflect"),
                     np.pad(corner, pad, "reflect")])
    u = np.array([[34.0, 30.0], [34.0, 30.0]], np.float32)
    sw = np.asarray(rematch.observation_weights(
        jnp.asarray(imgs), pad, jnp.array([0, 1], jnp.int32),
        jnp.asarray(u)))
    # Edge: rank-~1 (one eigenvalue ~1, other ~0). W = sw @ sw.
    We = sw[0] @ sw[0]
    evals_e = np.linalg.eigvalsh(We)
    assert evals_e[0] < 0.1 and evals_e[1] > 0.9
    # Corner sample point: both directions constrained.
    Wc = sw[1] @ sw[1]
    evals_c = np.linalg.eigvalsh(Wc)
    assert evals_c[0] > 0.3
