#!/usr/bin/env python
"""Experiment: fused Pallas smoother end-to-end cost on the live device.

Times pallas_smoother.smooth (layout build + kernel + unslot) at the
production shape, plus the kernel alone and the layout build alone, so
layout-build regressions are visible (the 22-scatter -> 4-row-scatter
rewrite shipped unvalidated once).

Usage: python tools/exp_pallas.py [alt_module.py]
  With an argument, also times build_layout from that file (e.g. a git
  show of an older revision) for A/B comparison.
"""

import importlib.util
import os
import sys

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

from flame_tpu.params import RegularizerParams
from flame_tpu.optimize import pallas_smoother as ps
import tools.microbench as mb


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    mb.RTT = mb.measure_rtt()
    print(f"rtt: {mb.RTT*1e3:.1f} ms")

    g, edges_np, n_e, tris_np, n_used = mb.make_graph(E=12288)
    V = g.x.shape[0]
    E = g.q1.shape[0]
    D = 16
    member = np.zeros(V, bool)
    member[:n_used] = True
    perm_np = ps.rcm_order(edges_np, n_e, V, member)
    inv_np = np.empty(V, np.int32)
    inv_np[perm_np] = np.arange(V, dtype=np.int32)
    ranks_np = ps.perm_edge_ranks(edges_np, n_e, inv_np, E, D)
    perm = jnp.asarray(perm_np)
    inv_perm = jnp.asarray(inv_np)
    ranks = jnp.asarray(ranks_np.astype(np.int32))
    p = RegularizerParams()

    for n_iters in (1, 40):
        f = jax.jit(lambda g: ps.smooth(p, g, perm, inv_perm, ranks,
                                        n_iters, D))
        def run():
            np.asarray(f(g).x[0])
        dt = mb.timeit(run)
        print(f"pallas/smooth@{n_iters:<3d}      {dt*1e3:8.2f} ms")

    def bench_layout(build_layout, name):
        bl = jax.jit(lambda g: build_layout(g, perm, inv_perm, ranks, D, 2))
        def run():
            out = bl(g)
            np.asarray(out[1][2][0, 0])  # slots sdx corner
        dt = mb.timeit(run)
        print(f"layout/{name:16s} {dt*1e3:8.2f} ms")

    bench_layout(ps.build_layout, "HEAD")
    if len(sys.argv) > 1:
        spec = importlib.util.spec_from_file_location("alt_ps", sys.argv[1])
        alt = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(alt)
        bench_layout(alt.build_layout, "alt")


if __name__ == "__main__":
    main()
