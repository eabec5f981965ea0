#!/usr/bin/env python
"""Capture a device profile of the steady-state bench loop.

Runs the bench scenario to steady state, then traces a few batch_step
dispatches with jax.profiler. The trace lands in /tmp/flame_trace as a
perfetto trace.json.gz we parse for per-op device time (the TPU analogue
of the reference's per-stage StatsTracker timers, flame.cc:545-549).
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/flame_trace")


def main():
    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    from flame_tpu.core.flame import Flame
    from flame_tpu.geometry import se3, camera
    import bench  # THE bench config — a drifting local copy would make
    # profiles attribute behavior to a posture the bench no longer runs

    W, H = 640, 480
    FX = 525.0
    PLANE_Z = 5.0

    def tex(X, Y):
        return (128 + 60 * np.sin(21.0 * X + 4.5 * Y)
                + 35 * np.cos(8.7 * X) + 18 * np.sin(11.6 * Y)
                + 10 * np.sin(4.2 * X))

    vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)

    def render(cam_x):
        X = (uu - W / 2) * PLANE_Z / FX + cam_x
        Y = (vv - H / 2) * PLANE_Z / FX
        return np.clip(tex(X, Y), 0, 255).astype(np.uint8)

    do_ba = os.environ.get("PROFILE_BA", "0") != "0"
    params = bench.make_params(do_ba)

    K = camera.make_k(FX, FX, W / 2, H / 2)
    Kinv = camera.inv_k(K)
    fl = Flame(W, H, K, Kinv, params)

    n_warm = 24 + (8 if do_ba else 0)
    fb = max(int(params.solver.frame_batch), 1)
    n_prof = 4 * fb if do_ba else 2 * fb  # 2 batches (4 w/ BA: cadence)
    frames = [render(0.08 * i) for i in range(n_warm + n_prof)]
    frames = [jax.device_put(f) for f in frames]
    jax.block_until_ready(frames)
    np.asarray(frames[-1][0, 0])

    def pose(i):
        return (se3.quat_identity(), jnp.array([0.08 * i, 0.0, 0.0]))

    for i in range(n_warm):
        fl.update(i * 0.1, i, pose(i), frames[i], i % 2 == 0)
        if i % 8 == 7:
            np.asarray(fl._idepthmap[0, 0])
    np.asarray(fl._idepthmap[0, 0])

    jax.profiler.start_trace(TRACE_DIR)
    for i in range(n_warm, n_warm + n_prof):
        fl.update(i * 0.1, i, pose(i), frames[i], i % 2 == 0)
    np.asarray(fl._idepthmap[0, 0])
    jax.profiler.stop_trace()
    print("trace written to", TRACE_DIR)

    # Parse the perfetto trace for device-lane op durations.
    cands = sorted(glob.glob(os.path.join(
        TRACE_DIR, "plugins/profile/*/*.trace.json.gz")))
    if not cands:
        print("NO trace.json.gz found; listing:", file=sys.stderr)
        for root, _, files in os.walk(TRACE_DIR):
            for f in files:
                print(os.path.join(root, f), file=sys.stderr)
        return
    with gzip.open(cands[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Find process/thread names to identify device lanes.
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    print("processes:", json.dumps(pid_names, indent=1))
    by_op = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e["pid"], "")
        if "TPU" not in pname and "device" not in pname.lower() \
                and "XLA" not in pname:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_op[name] = by_op.get(name, 0.0) + dur
        total += dur
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:60]
    print(f"total device op time: {total:.2f} ms over {n_prof} frames")
    for name, ms in top:
        print(f"{ms:9.3f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
