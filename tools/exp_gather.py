#!/usr/bin/env python
"""Measure TPU row-gather cost vs (index count, row width, dtype).

Decides the line-stereo sample-gather diet (NOTES.md r5 agenda #1): the
[N, S] epipolar sampling gathers ~156k packed-corner rows per frame from
the new frame's (H*W, 4) f32 table. If gather cost is per-INDEX, the
only lever is fewer indices (block-packing 3 consecutive samples into
one 4x4-block row); if per-BYTE, a bf16/u8 diet pays.

Run on the real chip: python tools/exp_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    T = 307200  # VGA pixel count
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, T - 1000, size=156_000), jnp.int32)
    idx_small = idx[:52_000]

    results = {}
    for width in (1, 2, 4, 8, 16):
        for dt in (jnp.float32, jnp.bfloat16, jnp.uint32):
            tbl = jnp.asarray(
                rng.random((T, width)).astype(np.float32))
            if dt == jnp.uint32:
                tbl = (tbl * 1e6).astype(jnp.uint32)
            else:
                tbl = tbl.astype(dt)

            @jax.jit
            def g(tb, ix):
                return jnp.sum(tb[ix].astype(jnp.float32), axis=-1)

            ms = timeit(g, tbl, idx)
            ms_small = timeit(g, tbl, idx_small)
            results[(width, dt.__name__)] = (ms, ms_small)
            print(f"width={width:2d} dtype={dt.__name__:9s} "
                  f"156k idx: {ms*1e3:7.1f} us   52k idx: {ms_small*1e3:7.1f} us")

    # Reference point: the element-wise 4-corner gather (4x the indices,
    # width 1) the small-query path uses.
    tbl = jnp.asarray(rng.random(T).astype(np.float32))
    idx4 = jnp.stack([idx, idx + 1, idx + 640, idx + 641], axis=-1)

    @jax.jit
    def g4(tb, ix):
        return jnp.sum(tb[ix], axis=-1)

    print(f"4-corner elementwise (624k idx, width 1): "
          f"{timeit(g4, tbl, idx4)*1e3:7.1f} us")


if __name__ == "__main__":
    main()
