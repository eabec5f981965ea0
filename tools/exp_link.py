#!/usr/bin/env python
"""Steady-state tunnel throughput under realistic per-frame traffic.

Per iteration: upload a VGA u8 image (307 KB), dispatch a small jit on it,
stage an async 106 KB fetch. Measures the sustained per-iteration time for
(a) full traffic, (b) no image upload, (c) no fetch — isolating link cost
from device compute.
"""

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

from flame_tpu.core.flame import _AsyncFetch


@jax.jit
def consume(img):
    return jnp.sum(img.astype(jnp.float32), axis=0, keepdims=True)


@jax.jit
def small(x):
    return (x * 1.000001)[:5296 * 5].reshape(5296, 5)


def run(n, do_img, do_fetch, imgs, base):
    fetches = []
    t0 = time.perf_counter()
    for i in range(n):
        if do_img:
            d = jnp.asarray(imgs[i % len(imgs)])
            s = consume(d)
        else:
            s = consume_base
        pk = small(base + i)
        if do_fetch:
            fetches.append(_AsyncFetch(pk))
            if len(fetches) > 2:
                fetches.pop(0).get()
    for f in fetches:
        f.get()
    np.asarray(s[0, 0])
    return (time.perf_counter() - t0) / n


def main():
    global consume_base
    imgs = [np.random.randint(0, 255, (480, 640), np.uint8)
            for _ in range(4)]
    base = jnp.arange(5296 * 5 + 100, dtype=jnp.float32)
    consume_base = consume(jnp.asarray(imgs[0]))
    # Warm.
    np.asarray(consume(jnp.asarray(imgs[0]))[0, 0])
    np.asarray(small(base)[0, 0])

    for (di, df, name) in [(True, True, "img+fetch"),
                           (True, False, "img only"),
                           (False, True, "fetch only"),
                           (False, False, "neither")]:
        dt = run(30, di, df, imgs, base)
        print(f"{name:12s} {dt*1e3:7.2f} ms/iter")


if __name__ == "__main__":
    main()
