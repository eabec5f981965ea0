#!/usr/bin/env python
"""flame_tpu benchmark: dense mesh estimation throughput on one chip.

Prints ONE JSON line:
  {"metric": "vga_dense_fps_per_chip", "value": N, "unit": "frames/sec",
   "vs_baseline": N / 100, "solver_iters_per_sec": M,
   "modes": {"resident": N[, "host_upload": N2]}, "do_ba": bool}

The baseline is the north-star target of 100 fps/chip for VGA dense mesh
estimation (BASELINE.md: the reference publishes no numbers; its README
claims real-time CPU operation only). solver_iters_per_sec is the
BASELINE.md row-5 north-star: NLTGV2-L1 primal-dual iterations/sec
through the PRODUCTION smoother on the live end-of-run graph. Runs on
whatever jax.devices()[0] is (the tunneled TPU under the driver; CPU as
fallback).

Env knobs: BENCH_RESIDENT=0 measures the host-upload ingestion mode as
the headline number; BENCH_BOTH=1 measures BOTH modes and reports each
under "modes" (VERDICT r3 #7: the 100 fps target is mode-conditional
through the shared dev tunnel — resident ingestion models a DMA/PCIe
camera feed, host upload pays the link's ~17-80 MB/s image-byte cost).
BENCH_BA=1 runs with the windowed bundle adjuster ON (the async BA
pipeline of ba/window.py — obs ride the packed fetch, solves apply
1-2 batches later); the deployment-posture number VERDICT r3 #3 asks
for. BENCH_VERBOSE=1 prints per-window/timing details to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_params(do_ba: bool):
    from flame_tpu.params import (Params, DetectionParams, SolverParams,
                                  BAParams)
    # BA deployment posture for the bench (BENCH_BA=1): the bench
    # declares every 2nd frame a poseframe (far denser than a real
    # frontend's ~1-in-10), so solving at every new poseframe would run
    # the ~14 ms window solve twice per 4-frame batch. Warm-started
    # solves every 4 new poseframes (2 refinements per window_size=8
    # turnover) with 3 GN iterations hold the ATE benefit at a fraction
    # of the device cost (tests/test_evaluation.py pins quality with
    # the default cadence; tools note in NOTES.md r4).
    ba = BAParams(n_gn_iters=int(os.environ.get("BENCH_BA_GN", 3)),
                  solve_min_new_pfs=int(
                      os.environ.get("BENCH_BA_MINPF", 4)))
    # Capacities sized to Delaunay maxima for 4096 features (T <= 2V,
    # E <= 3V): the per-frame topology upload scales with them and the
    # tunnel link is the bottleneck.
    return Params(
        feature_capacity=4096, edge_capacity=12288, triangle_capacity=8192,
        poseframe_capacity=16,
        min_height=-1e6, max_height=1e6,
        idepth_init=0.05,
        min_baseline=float(os.environ.get('BENCH_MINB', 0.01)),
        detection=DetectionParams(win_size=16),
        do_ba=do_ba, ba=ba,
        solver=SolverParams(
            # The r2 bench config (degree 16, reach 2) dropped 1-2 edges
            # per frame (the self-tripped capacity warning, VERDICT r2
            # weak #1). Cause-separated counters (r3) attribute the
            # drops to per-vertex slot overflow (degree), not the RCM
            # band: 20 slots covers the observed Delaunay degree with
            # margin (~+25% smoothing slot work, ~2 us/iter), and
            # reach=3 keeps the band clean at this scale.
            max_vertex_degree=int(os.environ.get("BENCH_DEGREE", 20)),
            pallas_reach=int(os.environ.get("BENCH_REACH", 3)),
            async_topology=True,
            # Experiment knobs (default production values).
            topology_lag=int(os.environ.get("BENCH_LAG", 2)),
            # Four frames per device dispatch (pipeline.batch_step): ONE
            # upload + ONE jit per batch divides the per-frame
            # RPC/transfer cost that dominates through the tunneled
            # device by 4. Measured 2026-08-21 (same coverage 0.92 /
            # err 0.0002-0.0003 throughout): resident batch=4 124.1
            # median (windows 97-139); host-upload batch=4 91.9 median
            # even in a bad link period where batch=2 sat at 45-54.
            frame_batch=int(os.environ.get("BENCH_BATCH", 4)),
            fetch_stride=int(os.environ.get("BENCH_STRIDE", 1)),
            # join_age 24 (r4; was 12 in r3): the blocking head-join is
            # the only stall in bad link weather — 12 amortizes it over
            # 3 batches, 24 over 6. r4 A/B (4 runs, alternating order):
            # ja24 94.5/97.5 vs ja12 81.1/76.9 median fps with identical
            # coverage/error, and ja24 runs consistently measured LOWER
            # fetch latency (fewer blocked joins congest the link less).
            # Topology staleness stays masked-inert either way.
            join_age=int(os.environ.get("BENCH_JOINAGE", 24)),
            smoother=os.environ.get("BENCH_SMOOTHER", "auto"),
            n_iters_per_frame=int(os.environ.get("BENCH_ITERS", 40))),
        debug_quiet=True)


def measure_mode(params, frames_np, resident: bool, pose, n_warm: int,
                 n_windows: int, win_len: int):
    """One full throughput measurement: fresh Flame, warmup, windowed
    measurement with real drains. Returns (fps_median, win_fps, fl)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flame_tpu.core.flame import Flame
    from flame_tpu.geometry import camera

    W, H = frames_np[0].shape[1], frames_np[0].shape[0]
    FX = 525.0
    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    fl = Flame(W, H, K, Kinv, params)

    if resident:
        frames = [jax.device_put(f) for f in frames_np]
        # Staging completes before the clock: block on EVERY transfer
        # explicitly (ADVICE r2), then prove completion with a real
        # device->host read (block_until_ready returns at RPC-accept on
        # the tunneled device, NOTES.md).
        jax.block_until_ready(frames)
        np.asarray(frames[-1][0, 0])
    else:
        frames = frames_np

    for i in range(n_warm):
        fl.update(i * 0.1, i, pose(i), frames[i], i % 2 == 0)
        if i % 8 == 7:
            # Drain mid/post-warmup: compiles and first-use executable
            # deserializations complete HERE, not in window 1.
            np.asarray(fl._idepthmap[0, 0])

    # Fixed round-trip cost of the drain fetch itself (measurement
    # overhead, not pipeline work — it would inflate every window by
    # ~27 ms through the tunnel).
    rtt_f = jax.jit(lambda v: v + 1)
    _ = np.asarray(rtt_f(jnp.float32(0)))
    t0 = time.perf_counter()
    _ = np.asarray(rtt_f(jnp.float32(0)))
    rtt = time.perf_counter() - t0

    # Measure in windows, each ending with a REAL device drain (on the
    # tunneled device block_until_ready returns at RPC-accept, NOT
    # completion — only a device->host read proves the work is done,
    # NOTES.md timing trap). The median window is the sustained rate:
    # the shared tunnel stalls for seconds at a time independently of
    # the workload, and a single-window measurement is hostage to it.
    win_fps = []
    k = 0
    for w in range(n_windows):
        t0 = time.perf_counter()
        for j in range(win_len):
            i = n_warm + k
            fl.update(i * 0.1, i, pose(i), frames[i], i % 2 == 0)
            k += 1
        np.asarray(fl._idepthmap[0, 0])  # drain: device + transfer queue
        dt = time.perf_counter() - t0
        win_fps.append(win_len / max(dt - rtt, 1e-6))

    return float(np.median(win_fps)), win_fps, fl


def solver_rate(params, fl):
    """NLTGV2 primal-dual iterations/sec on the live graph through the
    PRODUCTION smoother (BASELINE.md row-5 north-star). Timed with a
    real fetch; one RTT subtracted. Large iteration count so device
    time dominates the tunnel's fetch-latency noise."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flame_tpu.core.pipeline import resolve_smoother
    from flame_tpu.optimize import nltgv2

    K_IT = 4000
    if resolve_smoother(params, params.feature_capacity) == "pallas":
        from flame_tpu.optimize import pallas_smoother as ps
        V = params.feature_capacity
        member = np.asarray(fl._graph.vtx_mask)
        edges = fl._edges_np[: fl._n_edges]
        perm = ps.rcm_order(edges, fl._n_edges, V, member)
        inv = np.empty(V, np.int32)
        inv[perm] = np.arange(V, dtype=np.int32)
        ranks = ps.perm_edge_ranks(
            edges, fl._n_edges, inv, params.edge_capacity,
            params.solver.max_vertex_degree, params.solver.pallas_reach)
        pd, ivd, rkd = (jnp.asarray(perm), jnp.asarray(inv),
                        jnp.asarray(ranks.astype(np.int32)))
        smooth = jax.jit(lambda g: ps.smooth(
            params.rparams, g, pd, ivd, rkd, K_IT,
            params.solver.max_vertex_degree,
            reach=params.solver.pallas_reach))
    else:
        smooth = jax.jit(lambda g: nltgv2.smooth(
            params.rparams, g, K_IT))
    rtt_f = jax.jit(lambda v: v + 1)
    _ = np.asarray(rtt_f(jnp.float32(0)))
    t0 = time.perf_counter()
    _ = np.asarray(rtt_f(jnp.float32(0)))
    rtt = time.perf_counter() - t0
    _ = np.asarray(smooth(fl._graph).x[0])
    t0 = time.perf_counter()
    _ = np.asarray(smooth(fl._graph).x[0])
    return K_IT / max(time.perf_counter() - t0 - rtt, 1e-9)


def main():
    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    from flame_tpu.geometry import se3

    # VGA synthetic scene: textured plane at 5m, sideways translation.
    W, H = 640, 480
    FX = 525.0
    PLANE_Z = 5.0

    def tex(X, Y):
        # World-to-pixel scale at VGA is Z/fx ~ 0.0095; frequencies chosen
        # so image gradients clear the detection threshold (>= 5/px).
        return (128 + 60 * np.sin(21.0 * X + 4.5 * Y)
                + 35 * np.cos(8.7 * X) + 18 * np.sin(11.6 * Y)
                + 10 * np.sin(4.2 * X))

    vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)

    def render(cam_x):
        X = (uu - W / 2) * PLANE_Z / FX + cam_x
        Y = (vv - H / 2) * PLANE_Z / FX
        # uint8 like a real camera: 4x less host->device upload traffic.
        return np.clip(tex(X, Y), 0, 255).astype(np.uint8)

    do_ba = os.environ.get("BENCH_BA", "0") != "0"
    params = make_params(do_ba)

    # Warmup must cover a FULL steady-state cycle, not just the first
    # dispatches: the first packed fetch is staged at dispatch
    # fetch_stride, joined ~join_age frames later, triangulated async,
    # and applied one pair after that (~frame 12 at the defaults) — only
    # then has every jit variant on the steady-state path executed once.
    # (+8 with BA on: the first window solve stages ~frame 6 and its
    # apply-side executables — guarded scatter, fused pose write — first
    # run 1-2 batches later; they must compile inside warmup.)
    n_warm = 16 + (8 if do_ba else 0)
    # 25 windows spread the measurement over a long enough span that the
    # shared tunnel's multi-second stall phases (config-independent; see
    # NOTES.md) are SAMPLED rather than dominant. win_len is rounded UP
    # to a multiple of frame_batch so every window's frames are fully
    # dispatched before its drain (ADVICE r2).
    fb = max(int(params.solver.frame_batch), 1)
    n_windows = int(os.environ.get("BENCH_WINDOWS", 25))
    win_len = -(-8 // fb) * fb
    n_meas = n_windows * win_len
    frames_np = [render(0.08 * i) for i in range(n_warm + n_meas)]

    def pose(i):
        return (se3.quat_identity(), jnp.array([0.08 * i, 0.0, 0.0]))

    # Image ingestion mode. Default: device-RESIDENT frames, staged off
    # the clock — the production analogue of a DMA/PCIe camera feed
    # (~10 us per VGA frame over real PCIe; the reference likewise reads
    # frames from RAM). The dev tunnel to this chip delivers as little
    # as ~17 MB/s in bad periods, i.e. a ~55 fps ceiling from the 307 KB
    # image bytes ALONE — that models the shared dev link, not any real
    # deployment. Everything else still crosses the real link every
    # frame: dispatch RPCs, packed feature transfers, topology uploads,
    # per-window drains. BENCH_RESIDENT=0 measures the full host-upload
    # path instead (images + topology coalesced, one transfer/batch).
    primary_resident = os.environ.get("BENCH_RESIDENT", "1") != "0"
    both = os.environ.get("BENCH_BOTH", "0") != "0"

    modes = {}
    fps, win_fps, fl = measure_mode(params, frames_np, primary_resident,
                                    pose, n_warm, n_windows, win_len)
    modes["resident" if primary_resident else "host_upload"] = round(fps, 2)
    if both:
        fps2, win_fps2, _fl2 = measure_mode(
            params, frames_np, not primary_resident, pose, n_warm,
            n_windows, win_len)
        modes["host_upload" if primary_resident else "resident"] = \
            round(fps2, 2)

    iters_per_sec = solver_rate(params, fl)

    cov = float(np.mean(~np.isnan(fl.get_inverse_depth_map())))
    idm = fl.get_inverse_depth_map()
    err = np.abs(idm[~np.isnan(idm)] - 1.0 / PLANE_Z) * PLANE_Z

    result = {
        "metric": "vga_dense_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 100.0, 4),
        "solver_iters_per_sec": round(iters_per_sec),
        "modes": modes,
        "do_ba": do_ba,
        # Quality + link-weather context ride the artifact: captured
        # medians through the shared dev tunnel swing 46-126 fps on
        # IDENTICAL code purely with link weather (NOTES.md r3/r4
        # campaigns); fetch_latency_ms is the blocked-join EMA that
        # indexes those phases (~40 ms good, 150+ ms degraded).
        "coverage": round(cov, 3),
        # null (not NaN — bare NaN is not strict JSON) when the map is
        # empty: exactly the catastrophic runs a parser must not choke on.
        "median_rel_depth_err": (round(float(np.median(err)), 4)
                                 if err.size else None),
    }
    weather = fl.stats.snapshot()["stats"].get("fetch_latency_ms")
    if weather is not None:
        result["fetch_latency_ms"] = round(float(weather), 1)

    if os.environ.get("BENCH_VERBOSE"):
        extra = {
            # coverage / median_rel_depth_err live in the main result
            # line now — not duplicated here.
            "win_fps": [round(f, 1) for f in win_fps],
            "n_feats": int(np.asarray(fl._feats.valid).sum()),
            "n_vtx": int(np.asarray(fl._graph.vtx_mask).sum()),
            "n_edges": fl._n_edges,
            "device": str(jax.devices()[0]),
            "timings_ms": {k: round(v, 2) for k, v in
                           fl.stats.snapshot()["timings_ms"].items()},
            "stats": {k: round(v, 3) for k, v in
                      fl.stats.snapshot()["stats"].items()},
        }
        if do_ba and fl._ba is not None:
            extra["ba_last_cost"] = fl._ba.last_cost
            extra["ba_last_accepted"] = fl._ba.last_accepted
        print(json.dumps(extra), file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
