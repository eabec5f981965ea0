#!/usr/bin/env python
"""Compare compaction schemes for rasterizer binning: rank-scatter vs
top_k vs argsort, at level-1 (40, 12288)->256 and level-2 (640, 256)->40
shapes, plus upload bandwidth sanity."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import tools.microbench as mb
from tools.microbench import timeit


def main():
    mb.RTT = mb.measure_rtt()
    print(f"rtt {mb.RTT*1e3:.1f} ms")
    rng = np.random.default_rng(0)

    for (R, T, K) in [(40, 12288, 256), (640, 256, 40)]:
        mask = jnp.asarray(rng.random((R, T)) < 0.02 + 10.0 / T)

        def scat(mask):
            rank = jnp.cumsum(mask, axis=1) - mask
            dest = jnp.where(mask & (rank < K), rank, K)
            ids = jnp.broadcast_to(jnp.arange(T)[None, :], mask.shape)
            order = jnp.zeros((R, K + 1), jnp.int32)
            order = order.at[
                jnp.broadcast_to(jnp.arange(R)[:, None], mask.shape),
                dest].set(ids, mode="drop")[:, :K]
            return order

        def topk(mask):
            key = jnp.where(mask, jnp.arange(T, dtype=jnp.int32), -1)
            vals, _ = jax.lax.top_k(key, K)
            return jnp.where(vals >= 0, vals, 0), vals >= 0

        js = jax.jit(scat)
        jt = jax.jit(topk)
        def run_s():
            np.asarray(js(mask)[0, 0])
        def run_t():
            np.asarray(jt(mask)[0][0, 0])
        print(f"({R:4d},{T:6d})->{K:3d}  scatter {timeit(run_s)*1e3:6.2f} ms"
              f"   top_k {timeit(run_t)*1e3:6.2f} ms")

    # Upload bandwidth: 64 KB and 512 KB host->device.
    for sz in (64 * 1024, 512 * 1024):
        buf = np.zeros(sz, np.uint8)
        def up():
            d = jnp.asarray(buf)
            np.asarray(d[0])
        print(f"upload {sz//1024:4d} KB          {timeit(up)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
