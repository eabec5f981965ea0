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


def test_rematch_img_pack_parity():
    """The persistent packed-table path (img_pack, as wired by
    window._solve_packed from FrameStack.img_pack) must reproduce the
    per-solve table-build path exactly on integer-valued images — both
    the refined pixels and the structure-tensor weights."""
    from flame_tpu.ops import interp
    H, W, pad = 64, 96, 8
    # u8-quantized (integer-valued) images: the bf16 packed table is
    # exact only on the u8 image domain (which is what the pipeline
    # feeds); a float-valued image would differ at ~2^-8 relative.
    img0 = np.round(_checker(H, W)).astype(np.float32)
    img1 = np.roll(img0, 2, axis=1)
    imgs = np.stack([np.pad(img0, pad, mode="reflect"),
                     np.pad(img1, pad, mode="reflect")])
    pack = jnp.concatenate(
        [interp.pack_image(jnp.asarray(f)) for f in imgs], axis=0)

    K = camera.make_k(100.0, 100.0, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    qw = jnp.tile(se3.quat_identity(), (2, 1))
    tw = jnp.zeros((2, 3))
    M = 16
    rng = np.random.default_rng(0)
    u_ref = rng.uniform(20, 60, (M, 2)).astype(np.float32)

    args = (K, Kinv, jnp.asarray(imgs), pad, qw, tw,
            jnp.zeros(M, jnp.int32), jnp.ones(M, jnp.int32),
            jnp.zeros(M, jnp.int32), jnp.ones(M, jnp.int32),
            jnp.asarray(u_ref), jnp.asarray(u_ref),
            jnp.zeros(M, jnp.int32), jnp.zeros((1,), jnp.float32),
            jnp.ones(M, bool))
    u_a, r_a = rematch.rematch_observations(*args, radius=3, min_eig=200.0)
    u_b, r_b = rematch.rematch_observations(*args, radius=3, min_eig=200.0,
                                            img_pack=pack)
    np.testing.assert_array_equal(np.asarray(r_a), np.asarray(r_b))
    np.testing.assert_array_equal(np.asarray(u_a), np.asarray(u_b))

    w_a = rematch.observation_weights(jnp.asarray(imgs), pad,
                                      jnp.zeros(M, jnp.int32),
                                      jnp.asarray(u_ref))
    w_b = rematch.observation_weights(jnp.asarray(imgs), pad,
                                      jnp.zeros(M, jnp.int32),
                                      jnp.asarray(u_ref), img_pack=pack)
    # The interpolated patches are bit-identical (u8 domain), but the
    # two graphs fuse the downstream structure-tensor reductions
    # differently, so the weights can differ by compile-level FMA
    # rounding — tight tolerance, not bit equality.
    np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_b),
                               rtol=1e-4, atol=1e-5)


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
