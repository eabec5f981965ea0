"""Dataset frontend tests: write miniature TUM-format and EuRoC-format
sequences to disk (synthetic renders), load them with the parsers, and run
them through the full pipeline (the BASELINE config-2 style end-to-end)."""

import csv
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from flame_tpu.core.flame import Flame
from flame_tpu.geometry import se3, camera
from flame_tpu.io import datasets

from test_flame_e2e import make_params, render, FX, W, H, TRUE_IDEPTH


def make_tum_dir(tmp, n=12, rate=30.0):
    root = os.path.join(tmp, "tum_seq")
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    with open(os.path.join(root, "rgb.txt"), "w") as frgb, \
         open(os.path.join(root, "groundtruth.txt"), "w") as fgt:
        frgb.write("# color images\n")
        fgt.write("# ground truth\n")
        for i in range(n):
            t = 1000.0 + i / rate
            cam_x = 0.15 * i
            img = render(cam_x)
            rel = f"rgb/{t:.6f}.png"
            Image.fromarray(img.astype(np.uint8)).save(
                os.path.join(root, rel))
            frgb.write(f"{t:.6f} {rel}\n")
            # Ground truth at slightly offset timestamps (tests interp);
            # qx qy qz qw order with identity rotation.
            fgt.write(f"{t - 0.003:.6f} {cam_x - 0.15 * 0.003 * rate:.6f} "
                      f"0.0 0.0 0.0 0.0 0.0 1.0\n")
    return root


def make_euroc_dir(tmp, n=10, rate=20.0):
    root = os.path.join(tmp, "euroc_seq")
    cam = os.path.join(root, "mav0", "cam0", "data")
    gt = os.path.join(root, "mav0", "state_groundtruth_estimate0")
    os.makedirs(cam, exist_ok=True)
    os.makedirs(gt, exist_ok=True)
    with open(os.path.join(root, "mav0", "cam0", "data.csv"), "w") as fc, \
         open(os.path.join(gt, "data.csv"), "w") as fg:
        fc.write("#timestamp [ns],filename\n")
        fg.write("#timestamp, p_RS_R_x [m], ...\n")
        for i in range(n):
            tns = int((100.0 + i / rate) * 1e9)
            cam_x = 0.15 * i
            name = f"{tns}.png"
            Image.fromarray(render(cam_x).astype(np.uint8)).save(
                os.path.join(cam, name))
            fc.write(f"{tns},{name}\n")
            fg.write(f"{tns},{cam_x},0.0,0.0,1.0,0.0,0.0,0.0\n")
    return root


def test_tum_loader_and_pipeline(tmp_path):
    root = make_tum_dir(str(tmp_path))
    frames = datasets.load_tum(root)
    assert len(frames) == 12
    # Interpolated poses track the camera x positions.
    xs = np.array([f.t[0] for f in frames])
    # Interior frames interpolate exactly; the final frame's timestamp is
    # past the last ground-truth entry, so its pose clamps (~1.4 cm early).
    np.testing.assert_allclose(xs[:-1], 0.15 * np.arange(11), atol=1e-3)
    assert abs(xs[-1] - 0.15 * 11) < 0.02
    img0 = frames[0].load_image()
    assert img0.shape == (H, W) and img0.dtype == np.uint8

    K = camera.make_k(FX, FX, W / 2, H / 2)
    fl = Flame(W, H, K, camera.inv_k(K), make_params())
    out = datasets.run_sequence(fl, frames, poseframe_every=2)
    assert out["n_ok"] > 5
    idm = fl.get_inverse_depth_map()
    err = np.abs(idm[~np.isnan(idm)] - TRUE_IDEPTH) / TRUE_IDEPTH
    assert np.median(err) < 0.1


def test_euroc_loader(tmp_path):
    root = make_euroc_dir(str(tmp_path))
    frames = datasets.load_euroc(root)
    assert len(frames) == 10
    xs = np.array([f.t[0] for f in frames])
    np.testing.assert_allclose(xs, 0.15 * np.arange(10), atol=1e-6)
    # wxyz identity quaternions.
    np.testing.assert_allclose(frames[3].q, [1, 0, 0, 0], atol=1e-6)
    assert frames[0].load_image().shape == (H, W)


def test_euroc_extrinsic():
    # T_body_cam rotating camera 90 deg about z: world pose composes.
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        root = make_euroc_dir(tmp, n=3)
        Tbc = np.eye(4)
        Tbc[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        Tbc[:3, 3] = [0.1, 0.0, 0.0]
        frames = datasets.load_euroc(root, T_body_cam=Tbc)
        # Camera position = body position + R_wb @ [0.1, 0, 0].
        np.testing.assert_allclose(frames[1].t, [0.25, 0.0, 0.0], atol=1e-5)
        # 90 deg z rotation quaternion.
        np.testing.assert_allclose(
            np.abs(frames[1].q),
            np.abs([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]), atol=1e-5)


def test_pose_track_gap_rejection():
    track = datasets.PoseTrack(
        [0.0, 0.1, 5.0], np.tile([1.0, 0, 0, 0], (3, 1)),
        np.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0]]))
    assert track.sample(0.05) is not None
    assert track.sample(2.0, max_gap=0.25) is None  # inside a 4.9 s hole
    assert track.sample(9.0, max_gap=0.25) is None  # beyond the end
