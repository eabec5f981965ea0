"""Checkpoint/resume round trip: a restored pipeline must produce identical
outputs and continue updating."""

import os

import numpy as np
import jax.numpy as jnp

from flame_tpu.core.flame import Flame
from flame_tpu.geometry import se3, camera
from flame_tpu.utils import checkpoint

from test_flame_e2e import make_params, render, FX, W, H


def run_frames(fl, start, stop):
    for i in range(start, stop):
        cam_x = 0.15 * i
        pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
        fl.update(i * 0.1, i, pose, render(cam_x), i % 2 == 0)


def test_checkpoint_round_trip(tmp_path):
    params = make_params()
    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)

    fl = Flame(W, H, K, Kinv, params)
    run_frames(fl, 0, 8)
    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save(path, fl)

    fl2 = Flame(W, H, K, Kinv, params)
    checkpoint.load(path, fl2)

    # Identical restored outputs.
    np.testing.assert_array_equal(fl2.get_inverse_depth_map(),
                                  fl.get_inverse_depth_map())
    v1, m1, _ = fl.get_raw_idepths()
    v2, m2, _ = fl2.get_raw_idepths()
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(m1, m2)
    assert fl2.num_data_updates == fl.num_data_updates
    assert fl2._pf_slot_by_id == fl._pf_slot_by_id

    # Restored instance must keep processing. NOTE: fl2 has no _fnew/_fprev
    # frames (they are transient); feed two frames to rebuild them.
    run_frames(fl2, 8, 11)
    assert fl2.num_data_updates > fl.num_data_updates
    idm = fl2.get_inverse_depth_map()
    assert np.mean(~np.isnan(idm)) > 0.2
