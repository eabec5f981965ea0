"""End-to-end pipeline test: synthetic posed monocular sequence through the
full Flame orchestrator (the reference has no such test; validation lived
downstream in flame_ros — SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flame_tpu.core.flame import Flame
from flame_tpu.geometry import se3, camera
from flame_tpu.params import (Params, DetectionParams, SolverParams,
                              FilterParams)

FX = 100.0
W, H = 160, 120
PLANE_Z = 5.0
TRUE_IDEPTH = 1.0 / PLANE_Z


def tex(X, Y):
    """World-plane texture with strong x-gradients (non-periodic).

    World-to-pixel scale is Z/fx = 0.05, so image gradients are
    0.05 * dtex/dX; frequencies are chosen to clear the detection
    threshold (|grad| >= 5/px) over most of the image.
    """
    return (128 + 60 * np.sin(4.1 * X + 0.9 * Y) + 35 * np.cos(1.73 * X)
            + 18 * np.sin(2.31 * Y) + 10 * np.sin(0.83 * X))


def render(cam_x):
    """Camera at (cam_x, 0, 0), identity rotation, viewing plane z=5."""
    vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)
    X = (uu - W / 2) * PLANE_Z / FX + cam_x
    Y = (vv - H / 2) * PLANE_Z / FX
    return tex(X, Y).astype(np.float32)


def make_params():
    return Params(
        feature_capacity=512, edge_capacity=2048, triangle_capacity=1024,
        poseframe_capacity=8,
        min_height=-100.0, max_height=100.0,  # disable MAV height gate
        idepth_init=0.05, idepth_var_init=0.25,
        detection=DetectionParams(win_size=16),
        solver=SolverParams(n_iters_per_frame=30, max_vertex_degree=16),
        debug_quiet=True)


@pytest.fixture(scope="module")
def run_sequence():
    """Run a 12-frame translating sequence once; reused by all checks."""
    params = make_params()
    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    fl = Flame(W, H, K, Kinv, params)

    results = []
    for i in range(12):
        cam_x = 0.15 * i
        pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
        is_pf = (i % 2 == 0)
        ok = fl.update(i * 0.1, i, pose, render(cam_x), is_pf)
        results.append(ok)
    return fl, results


def test_update_returns_true_after_bootstrap(run_sequence):
    fl, results = run_sequence
    # Bootstrap (no features yet) frames return False; the pipeline must be
    # live well before the end.
    assert not results[0]
    assert any(results[:6])
    assert all(results[6:])


def test_dense_idepthmap_accuracy(run_sequence):
    fl, _ = run_sequence
    idm = fl.get_inverse_depth_map()
    cov = np.mean(~np.isnan(idm))
    assert cov > 0.3, f"coverage too low: {cov}"
    err = np.abs(idm[~np.isnan(idm)] - TRUE_IDEPTH) / TRUE_IDEPTH
    assert np.median(err) < 0.1, f"median rel err {np.median(err)}"


def test_raw_idepths_accuracy(run_sequence):
    fl, _ = run_sequence
    verts, mu, var = fl.get_raw_idepths()
    assert verts.shape[0] > 30
    rel = np.abs(mu - TRUE_IDEPTH) / TRUE_IDEPTH
    assert np.median(rel) < 0.08
    assert np.all(var >= 0)


def test_mesh_output_consistency(run_sequence):
    fl, _ = run_sequence
    mesh = fl.get_inverse_depth_mesh()
    nv = mesh["vertices"].shape[0]
    assert nv >= 3
    assert mesh["idepths"].shape == (nv,)
    assert mesh["normals"].shape == (nv, 3)
    T = mesh["triangles"].shape[0]
    assert mesh["tri_validity"].shape == (T,)
    assert mesh["triangles"].min() >= 0
    assert mesh["triangles"].max() < nv
    assert mesh["edges"].min() >= 0
    assert mesh["edges"].max() < nv
    # Normals for a fronto-parallel plane should face mostly -z.
    n = mesh["normals"]
    nz = n[np.linalg.norm(n, axis=1) > 0.5][:, 2]
    assert np.median(nz) < -0.8


def test_filtered_map_subset_of_unfiltered(run_sequence):
    fl, _ = run_sequence
    full = fl.get_inverse_depth_map()
    filt = fl.get_filtered_inverse_depth_map()
    # Filtered coverage can only shrink.
    assert np.sum(~np.isnan(filt)) <= np.sum(~np.isnan(full))


def test_failure_stats_present(run_sequence):
    fl, _ = run_sequence
    st = fl.failure_stats()
    assert st["updates"] > 20
    assert all(v >= 0 for v in st.values())


def test_stats_timings(run_sequence):
    fl, _ = run_sequence
    snap = fl.stats.snapshot()
    # Detection is fused into the update_idepths dispatch (one jit per
    # frame), so it no longer has its own timer.
    for key in ("update", "update_idepths", "triangulate", "sync_graph",
                "frame_creation"):
        assert key in snap["timings_ms"], key


def test_pose_update_and_prune(run_sequence):
    fl, _ = run_sequence
    ids = sorted(fl._pf_slot_by_id.keys())
    assert len(ids) >= 2
    # Nudge a pose (BA hook).
    fl.update_poseframe_poses(
        {ids[0]: (np.array([1.0, 0, 0, 0]), np.array([0.0, 0.0, 1e-4]))})
    # Prune all but the newest two.
    fl.prune_poseframes(ids[-2:])
    assert sorted(fl._pf_slot_by_id.keys()) == sorted(ids[-2:])
    # Features survive re-anchoring (some may die at borders).
    assert int(np.asarray(fl._feats.valid).sum()) > 10


def test_clear_resets(run_sequence):
    fl, _ = run_sequence
    fl.clear()
    assert not fl.inited
    assert int(np.asarray(fl._feats.valid).sum()) == 0


def test_async_topology_mode():
    """async_topology (one-frame-lag triangulation) must converge to the
    same quality as the synchronous mode."""
    from flame_tpu.params import SolverParams
    params = make_params().replace(
        solver=SolverParams(n_iters_per_frame=30, max_vertex_degree=16,
                            async_topology=True))
    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    from flame_tpu.geometry import camera as cam_mod
    fl = Flame(W, H, K, Kinv, params)
    for i in range(12):
        cam_x = 0.15 * i
        pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
        fl.update(i * 0.1, i, pose, render(cam_x), i % 2 == 0)
    idm = fl.get_inverse_depth_map()
    cov = np.mean(~np.isnan(idm))
    assert cov > 0.25, cov
    err = np.abs(idm[~np.isnan(idm)] - TRUE_IDEPTH) / TRUE_IDEPTH
    assert np.median(err) < 0.12, np.median(err)
    # Mesh getters stay index-consistent under the lagged topology.
    mesh = fl.get_inverse_depth_mesh()
    if mesh["triangles"].size:
        assert mesh["triangles"].max() < mesh["vertices"].shape[0]


def test_rescale_data_mode():
    """rescale_data renormalizes the graph scale without changing outputs
    (reference flame.cc:328-351)."""
    params = make_params().replace(rescale_data=True)
    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    fl = Flame(W, H, K, Kinv, params)
    for i in range(10):
        cam_x = 0.15 * i
        pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
        fl.update(i * 0.1, i, pose, render(cam_x), i % 2 == 0)
    scale = float(np.asarray(fl._graph_scale_dev))
    # Scale should have renormalized to ~ mean idepth (0.2), not stayed 1.
    assert 0.1 < scale < 0.4, scale
    # x is O(1): x*scale ~ idepth.
    idm = fl.get_inverse_depth_map()
    err = np.abs(idm[~np.isnan(idm)] - TRUE_IDEPTH) / TRUE_IDEPTH
    assert np.median(err) < 0.12, np.median(err)


def test_init_with_prediction_mode():
    """init_with_prediction seeds new vertices from the previous dense map
    (reference flame.cc:2132-2158); must converge at least as well."""
    params = make_params().replace(init_with_prediction=True)
    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    fl = Flame(W, H, K, Kinv, params)
    for i in range(12):
        cam_x = 0.15 * i
        pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
        fl.update(i * 0.1, i, pose, render(cam_x), i % 2 == 0)
    idm = fl.get_inverse_depth_map()
    err = np.abs(idm[~np.isnan(idm)] - TRUE_IDEPTH) / TRUE_IDEPTH
    assert np.median(err) < 0.1
    # fps EMA stats exist (reference flame.cc:513-539 pattern).
    assert fl.stats.stats("fps_max") > 0


def test_debug_images(run_sequence):
    fl, _ = run_sequence
    for name in ("wireframe", "features", "idepthmap", "normals",
                 "detections", "matches"):
        img = getattr(fl, f"get_debug_image_{name}")()
        assert img.shape == (H, W, 3) and img.dtype == np.uint8, name


def test_auto_poseframe_selection():
    """params.auto_poseframe: update(is_poseframe=None) declares poseframes
    itself, spaced by the probe-disparity target (new capability; the
    reference's frontend decides, flame.h:145-147)."""
    params = make_params()
    import dataclasses
    params = dataclasses.replace(params, auto_poseframe=True,
                                 auto_pf_max_disparity=12.0,
                                 auto_pf_depth=PLANE_Z)
    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    fl = Flame(W, H, K, Kinv, params)

    n_pf = 0
    for i in range(16):
        cam_x = 0.15 * i
        pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
        before = len(fl._pf_slot_by_id)
        fl.update(i * 0.1, i, pose, render(cam_x), None)
        n_pf += len(fl._pf_slot_by_id) - before

    # Probe at (W/2, H/2), depth 5: disparity = fx * |dx| / z = 3 px per
    # frame -> a poseframe roughly every 4 frames after the first.
    assert 3 <= n_pf <= 7, n_pf
    idm = fl.get_inverse_depth_map()
    assert np.mean(~np.isnan(idm)) > 0.3


def test_coalesced_uploads_match_separate():
    """solver.coalesce_uploads (topology words riding the image upload as
    one combined u8 buffer, split on device) must produce the same maps as
    separate uploads, modulo its one extra frame of topology lag."""
    from flame_tpu.params import SolverParams
    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)

    def run(coalesce):
        params = make_params().replace(
            solver=SolverParams(n_iters_per_frame=30, max_vertex_degree=16,
                                async_topology=True,
                                coalesce_uploads=coalesce))
        fl = Flame(W, H, K, Kinv, params)
        for i in range(14):
            cam_x = 0.15 * i
            pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
            img = np.clip(render(cam_x), 0, 255).astype(np.uint8)
            fl.update(i * 0.1, i, pose, img, i % 2 == 0)
        return fl

    fl_c = run(True)
    fl_s = run(False)
    assert fl_c._coalesce  # the path actually engaged
    idm_c = fl_c.get_inverse_depth_map()
    idm_s = fl_s.get_inverse_depth_map()
    for idm in (idm_c, idm_s):
        cov = np.mean(~np.isnan(idm))
        assert cov > 0.25, cov
        err = np.abs(idm[~np.isnan(idm)] - TRUE_IDEPTH) / TRUE_IDEPTH
        assert np.median(err) < 0.12, np.median(err)
    both = ~np.isnan(idm_c) & ~np.isnan(idm_s)
    assert both.mean() > 0.2
    # Same features, same filters; only topology freshness differs.
    diff = np.abs(idm_c[both] - idm_s[both]) / TRUE_IDEPTH
    assert np.median(diff) < 0.05, np.median(diff)


def test_poseframe_capacity_auto_evict():
    """Past poseframe capacity every new poseframe auto-evicts the oldest
    (prune_poseframes with the deferred mirror refresh): the pipeline must
    keep producing a good map with features re-anchored onto survivors."""
    from flame_tpu.params import SolverParams
    params = make_params().replace(
        poseframe_capacity=4,
        solver=SolverParams(n_iters_per_frame=30, max_vertex_degree=16,
                            async_topology=True))
    K = camera.make_k(FX, FX, W / 2, H / 2)
    fl = Flame(W, H, K, camera.inv_k(K), params)
    n = 24  # 12 poseframes -> 8 auto-evictions
    for i in range(n):
        cam_x = 0.15 * i
        pose = (se3.quat_identity(), jnp.array([cam_x, 0.0, 0.0]))
        img = np.clip(render(cam_x), 0, 255).astype(np.uint8)
        fl.update(i * 0.1, i, pose, img, i % 2 == 0)

    assert len(fl._pf_slot_by_id) == 4
    assert sorted(fl._pf_slot_by_id) == [16, 18, 20, 22]
    # Every surviving feature's anchor is a live poseframe slot.
    valid = np.asarray(fl._feats.valid)
    anchors = np.asarray(fl._feats.pf_slot)[valid]
    live_slots = set(fl._pf_slot_by_id.values())
    assert set(anchors.tolist()) <= live_slots
    idm = fl.get_inverse_depth_map()
    cov = np.mean(~np.isnan(idm))
    assert cov > 0.25, cov
    err = np.abs(idm[~np.isnan(idm)] - TRUE_IDEPTH) / TRUE_IDEPTH
    assert np.median(err) < 0.12, np.median(err)
