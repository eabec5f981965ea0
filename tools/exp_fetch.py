#!/usr/bin/env python
"""Why does a staged async fetch not complete while the host keeps
dispatching? Distinguish GIL starvation from tunnel-FIFO semantics.

Protocol: dispatch a medium computation, stage an _AsyncFetch of its
output, then (a) sleep 150 ms (GIL fully released) and check ready();
(b) same but keep the main thread busy dispatching unrelated device work;
(c) same but keep the main thread busy in pure-python spin.
"""

import os
import sys
import time
import threading

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
def work(x):
    for _ in range(8):
        x = jnp.tanh(x @ x)
    return x


@jax.jit
def packed_like(x):
    return jnp.sum(x, axis=1, keepdims=True) * jnp.ones((1, 5))


def main():
    x = jnp.ones((512, 512), jnp.float32) * 0.01
    # Warm compiles.
    np.asarray(work(x))
    np.asarray(packed_like(work(x)))

    def stage():
        y = work(x)
        pk = packed_like(y)  # ~10 KB transfer
        return _AsyncFetch(pk)

    # (a) main sleeps.
    f = stage()
    time.sleep(0.15)
    print(f"after 150ms sleep:        ready={f.ready()}")
    f.get()

    # (b) main keeps dispatching device work.
    f = stage()
    t0 = time.perf_counter()
    z = x
    while time.perf_counter() - t0 < 0.15:
        z = work(z)
    print(f"after 150ms dispatching:  ready={f.ready()}")
    f.get()
    np.asarray(z[0, 0])

    # (c) main spins in pure python (holds GIL in chunks).
    f = stage()
    t0 = time.perf_counter()
    s = 0
    while time.perf_counter() - t0 < 0.15:
        s += sum(range(1000))
    print(f"after 150ms py-spin:      ready={f.ready()}")
    f.get()

    # (d) fetch latency when device is idle and main joins immediately.
    f = stage()
    t0 = time.perf_counter()
    f.get()
    print(f"immediate join:           {1e3*(time.perf_counter()-t0):.1f} ms")


if __name__ == "__main__":
    main()


def uploads_starve_test():
    """Does upload traffic starve a staged fetch response?"""
    import numpy as np
    x = jnp.ones((512, 512), jnp.float32) * 0.01
    np.asarray(work(x))
    np.asarray(packed_like(work(x)))
    img = np.random.randint(0, 255, (480, 640), np.uint8)
    d = jnp.asarray(img)

    f = _AsyncFetch(packed_like(work(x)))
    t0 = time.perf_counter()
    n_up = 0
    while time.perf_counter() - t0 < 0.15:
        d = jnp.asarray(img)
        n_up += 1
    print(f"after 150ms uploading ({n_up} x 307KB): ready={f.ready()}")
    f.get()
    np.asarray(d[0])


if __name__ == "__main__":
    pass
