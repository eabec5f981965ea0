#!/usr/bin/env python
"""Measure in-scan gather formulations by DEVICE time (profiler trace).

Context (r4b): the device profile shows batch_step's gathers running at
~1 element/cycle (fusion.998: 622k elements in 671 us/frame — the
line-stereo [N, S] sample gather). Isolated wall-clock microbenches are
USELESS on this platform: block_until_ready() does NOT block through
the axon tunnel (a 4096^3 matmul "completes" in 21 us; fetch-verified
2s). So each variant here runs under jax.profiler and is scored by the
summed XLA-module device time of its own jit.

Variants (all inside a K-iteration scan over per-iteration images,
matching batch_step's structure):
  pack_row   — (H*W, 4) packed-corner table + row gather (production)
  elem4      — 4-corner element gather straight from the flat image
  u32pack    — corners bit-packed u8x4 into one u32 element gather
  half_bf16  — packed-corner table in bf16 (half the row bytes)
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 490, 650
T = H * W
N = 155_648
K = 16
TRACE = "/tmp/gather_trace"


def module_times(trace_dir):
    cands = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(cands[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    out = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_names.get(e["pid"], ""):
            continue
        name = e.get("name", "")
        if name.startswith("jit_scan_"):
            out[name.split("(")[0]] = out.get(name.split("(")[0], 0.0) \
                + e.get("dur", 0) / 1e3
    return out


def main():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, size=(K, H, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T - 2 * W, size=(K, N)), jnp.int32)

    def pack4(flat):
        return jnp.stack([flat, jnp.roll(flat, -1), jnp.roll(flat, -W),
                          jnp.roll(flat, -W - 1)], axis=1)

    def mk(body, name):
        def stepped(imgs, idx):
            def b(c, xs):
                v = body(*xs)
                v = jax.lax.optimization_barrier(v)
                return c + jnp.sum(v[:7:3]), None
            out, _ = jax.lax.scan(b, jnp.float32(0), (imgs, idx))
            return out
        stepped.__name__ = name  # names the jitted XLA module in the trace
        return stepped

    def scan_pack_row(img, ix):
        return pack4(img.reshape(-1))[ix]

    def scan_elem4(img, ix):
        flat = img.reshape(-1)
        i4 = jnp.stack([ix, ix + 1, ix + W, ix + W + 1], axis=-1)
        return flat[i4]

    def scan_u32pack(img, ix):
        flat = img.reshape(-1).astype(jnp.uint32)
        packed = (flat | (jnp.roll(flat, -1) << 8)
                  | (jnp.roll(flat, -W) << 16)
                  | (jnp.roll(flat, -W - 1) << 24))
        g = packed[ix]
        return jnp.stack([g & 0xFF, (g >> 8) & 0xFF, (g >> 16) & 0xFF,
                          (g >> 24) & 0xFF], -1).astype(jnp.float32)

    def scan_half_bf16(img, ix):
        return pack4(img.reshape(-1).astype(jnp.bfloat16))[ix] \
            .astype(jnp.float32)

    fns = {}
    for f in (scan_pack_row, scan_elem4, scan_u32pack, scan_half_bf16):
        fns[f.__name__] = jax.jit(mk(f, f.__name__))

    # Warm up (compile) outside the trace; force completion by fetch.
    outs = {name: f(imgs, idx) for name, f in fns.items()}
    for name in fns:
        np.asarray(outs[name])

    jax.profiler.start_trace(TRACE)
    res = []
    for _ in range(10):
        for name, f in fns.items():
            res.append(f(imgs, idx))
    for r in res:
        r.block_until_ready()
    np.asarray(res[-1])
    jax.profiler.stop_trace()

    times = module_times(TRACE)
    for name, ms in sorted(times.items()):
        print(f"{name:22s}: {ms / 10 / K * 1e3:8.1f} us/iter device")


if __name__ == "__main__":
    main()
