#!/usr/bin/env python
"""Per-kernel microbenchmarks on the live device.

Times the hot per-frame kernels in isolation: NLTGV2 smoothing variants,
mesh_outputs and its components, topology build, and the fused tracking
step. Timing protocol (see NOTES.md): block_until_ready on the tunneled
device returns at RPC-accept, so every measurement chains R dependent
dispatches and ends in a tiny np.asarray fetch; one fixed RTT is
subtracted.

Usage: python tools/microbench.py [kernel ...]
  kernels: smooth mesh topo track post all (default: all)
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

RTT = None  # measured at startup


def measure_rtt():
    """Fixed cost of a dispatch+fetch round trip."""
    x = jnp.zeros((), jnp.float32)
    f = jax.jit(lambda v: v + 1)
    _ = np.asarray(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timeit(fn, reps=5, inner=1):
    """fn() must END with a host fetch. Returns best seconds minus RTT,
    divided by inner."""
    fn()  # warm
    best = min(max(_timed(fn) - RTT, 1e-9) for _ in range(reps))
    return best / inner


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def make_graph(V=4096, E=16384, n_used=2700, seed=0):
    """Realistic graph: Delaunay over random VGA points."""
    from scipy.spatial import Delaunay as SDelaunay
    from flame_tpu.optimize import nltgv2

    rng = np.random.default_rng(seed)
    pts = rng.uniform([8, 8], [632, 472], size=(n_used, 2)).astype(np.float32)
    sd = SDelaunay(pts)
    tris = sd.simplices
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e = np.sort(e, axis=1)
    e = np.unique(e[:, 0].astype(np.int64) * V + e[:, 1])
    e = np.stack([e // V, e % V], axis=1)
    n_e = e.shape[0]
    assert n_e <= E, (n_e, E)

    edges = np.zeros((E, 2), np.int64)
    edges[:n_e] = e
    emask = np.zeros(E, bool)
    emask[:n_e] = True
    vmask = np.zeros(V, bool)
    vmask[:n_used] = True

    g = nltgv2.empty(V, E, 16)
    pos = np.zeros((V, 2), np.float32)
    pos[:n_used] = pts
    d = pos[edges[:, 0]] - pos[edges[:, 1]]
    ln = np.sqrt((d * d).sum(1))
    alpha = np.where(emask & (ln > 1e-6), 1.0 / np.maximum(ln, 1e-6), 0.0)
    x = rng.uniform(0.15, 0.25, V).astype(np.float32) * vmask
    g = g._replace(
        pos=jnp.asarray(pos), x=jnp.asarray(x), x_bar=jnp.asarray(x),
        data_term=jnp.asarray(x + rng.normal(0, 0.01, V).astype(np.float32)
                              * vmask),
        data_weight=jnp.asarray(vmask.astype(np.float32)),
        vtx_mask=jnp.asarray(vmask),
        edges=jnp.asarray(edges.astype(np.int32)),
        alpha=jnp.asarray(alpha.astype(np.float32)),
        beta=jnp.asarray(emask.astype(np.float32)),
        edge_mask=jnp.asarray(emask))
    return g, e, n_e, tris, n_used


def _with_incidence(g, degree=16):
    """Attach host-built incidence tables + src_slot to a make_graph graph."""
    from flame_tpu.optimize import nltgv2
    V = g.x.shape[0]
    E = g.q1.shape[0]
    edges_np = np.asarray(g.edges)
    emask_np = np.asarray(g.edge_mask)
    inc_e, inc_s = nltgv2.build_incidence(edges_np, emask_np, V, degree)
    src = nltgv2.build_src_slot(inc_e, inc_s, E)
    return g._replace(inc_edge=jnp.asarray(inc_e),
                      inc_sign=jnp.asarray(inc_s),
                      src_slot=jnp.asarray(src))


def bench_smooth(g, n_iters=40):
    from flame_tpu.params import RegularizerParams
    from flame_tpu.optimize import nltgv2
    p = RegularizerParams()
    gi = _with_incidence(g)

    variants = {"stacked": (g, dict(stacked=True)),
                "vertex": (gi, dict(mode="vertex"))}
    for name, (gg, kw) in variants.items():
        def run(gg=gg, kw=kw):
            out = nltgv2.smooth(p, gg, n_iters, **kw)
            np.asarray(out.x[0])
        dt = timeit(run, inner=n_iters)
        print(f"smooth/{name:24s} {dt*1e3:8.3f} ms/iter "
              f"({dt*n_iters*1e3:7.2f} ms @ {n_iters})")
    # Fixed cost: vertex mode at 1 vs 81 iters gives slope+intercept.
    for k in (1, 81):
        def run(k=k):
            out = nltgv2.smooth(p, gi, k, mode="vertex")
            np.asarray(out.x[0])
        dt = timeit(run)
        print(f"smooth/vertex@{k:<3d}            {dt*1e3:8.3f} ms total")


def bench_mesh(g, tris_np, n_used):
    from flame_tpu.params import Params
    from flame_tpu.mesh import filters as mesh_filters
    from flame_tpu.ops import rasterize as raster
    from flame_tpu.core import pipeline

    params = Params(min_height=-1e6, max_height=1e6)
    H, W = 480, 640
    K = jnp.asarray([[525., 0, 320], [0, 525., 240], [0, 0, 1]], jnp.float32)
    Kinv = jnp.linalg.inv(K)
    T_cap = 12288
    tris = np.zeros((T_cap, 3), np.int32)
    tris[:tris_np.shape[0]] = tris_np
    tmask = np.zeros(T_cap, bool)
    tmask[:tris_np.shape[0]] = True
    tris_d = jnp.asarray(tris)
    tmask_d = jnp.asarray(tmask)
    scale = jnp.float32(1.0)

    full = jax.jit(lambda g, t, m, s: pipeline.mesh_outputs(
        params, K, Kinv, W, H, g, t, m, s))
    vi = jnp.where(g.vtx_mask, g.x, 0.0)

    def run_full():
        outs = full(g, tris_d, tmask_d, scale)
        np.asarray(outs[-1][0, 0])
    print(f"mesh/full                  {timeit(run_full)*1e3:8.2f} ms")

    nrm = jax.jit(lambda: mesh_filters.vertex_normals(Kinv, g.pos, vi,
                                                      tris_d, tmask_d))
    def run_n():
        np.asarray(nrm()[0, 0])
    print(f"mesh/normals               {timeit(run_n)*1e3:8.2f} ms")

    filt = jax.jit(lambda: mesh_filters.apply_filters(
        params.tri_filter, Kinv, W, g.pos, vi, tris_d, tmask_d))
    def run_f():
        np.asarray(filt()[0])
    print(f"mesh/filters               {timeit(run_f)*1e3:8.2f} ms")

    rast = jax.jit(lambda: raster.rasterize(g.pos, tris_d, vi, tmask_d,
                                            H, W))
    def run_r():
        np.asarray(rast()[0, 0])
    print(f"mesh/rasterize             {timeit(run_r)*1e3:8.2f} ms")


def bench_topo(g, edges_np, n_e):
    from flame_tpu.optimize import topology
    V, E = g.x.shape[0], g.q1.shape[0]
    edges_full = np.zeros((E, 2), np.int16)
    edges_full[:n_e] = edges_np
    edges_d = jnp.asarray(edges_full)

    fe = jax.jit(lambda: topology.from_edges(
        edges_d, jnp.int32(n_e), g.pos, g.edges, g.edge_mask,
        g.q1, g.q2, g.q3, E, V, 16, build_incidence=False))
    def run():
        np.asarray(fe().alpha[0])
    print(f"topo/from_edges            {timeit(run)*1e3:8.2f} ms")

    ranks = topology.build_edge_ranks(edges_np, V, E)
    ranks_d = jnp.asarray(ranks)
    fi = jax.jit(lambda: topology.from_edges(
        edges_d, jnp.int32(n_e), g.pos, g.edges, g.edge_mask,
        g.q1, g.q2, g.q3, E, V, 16, build_incidence=True, ranks=ranks_d))
    def run_i():
        np.asarray(fi().alpha[0])
    print(f"topo/from_edges+inc        {timeit(run_i)*1e3:8.2f} ms")


def bench_track():
    import __graft_entry__ as ge
    from flame_tpu.core import pipeline
    from flame_tpu.params import Params, SolverParams

    params = Params(feature_capacity=4096, edge_capacity=16384,
                    triangle_capacity=12288, poseframe_capacity=16,
                    min_height=-1e6, max_height=1e6,
                    solver=SolverParams(max_vertex_degree=16))
    H, W = 480, 640
    K, Kinv, stack, feats, fnew, _ = ge._synthetic_state(
        params, H, W, n_feat_used=2700)

    def run():
        out = pipeline.track_project_sync(params, K, Kinv, stack, feats,
                                          fnew, 0)
        np.asarray(out[0].idepth_mu[0])
    print(f"track/track_project_sync   {timeit(run)*1e3:8.2f} ms")


def bench_trackparts():
    """Stage breakdown inside track_project_sync (each stage jitted alone;
    sums slightly above the fused step because fusion is lost)."""
    import functools
    import __graft_entry__ as ge
    from flame_tpu.core import pipeline
    from flame_tpu.geometry import epipolar, se3
    from flame_tpu.stereo import filter as idfilter, line_stereo, meas_model
    from flame_tpu.params import Params, SolverParams

    params = Params(feature_capacity=4096, edge_capacity=16384,
                    triangle_capacity=12288, poseframe_capacity=16,
                    min_height=-1e6, max_height=1e6,
                    solver=SolverParams(max_vertex_degree=16))
    H, W = 480, 640
    K, Kinv, stack, feats, fnew, _ = ge._synthetic_state(
        params, H, W, n_feat_used=2700)
    fp = params.fparams
    pad = (fnew.img_pad.shape[0] - H) // 2
    n_steps = line_stereo.n_steps_for(fp.epilength_max)

    geos_fn = jax.jit(lambda: pipeline._feature_geos(
        K, Kinv, stack, feats, fnew.q, fnew.t))
    geos = geos_fn()

    def t(name, fn, fetch):
        f = jax.jit(fn)
        R = 8
        def run():
            for _ in range(R):
                out = f()
            np.asarray(fetch(out))
        print(f"trackparts/{name:16s} {timeit(run, inner=R)*1e3:8.2f} ms")

    t("geos", lambda: pipeline._feature_geos(
        K, Kinv, stack, feats, fnew.q, fnew.t),
      lambda o: o.KRKinv[0, 0, 0])
    t("predict", lambda: jax.vmap(
        idfilter.predict, in_axes=(0, None, 0, 0, 0))(
            geos, fp.process_var_factor, feats.xy, feats.idepth_mu,
            feats.idepth_var), lambda o: o[1][0, 0])
    t("search_region", lambda: jax.vmap(
        functools.partial(idfilter.get_search_region, fp),
        in_axes=(0, None, None, 0, 0, 0))(
            geos, W, H, feats.xy, feats.idepth_mu, feats.idepth_var),
      lambda o: o.start[0, 0])
    reg = jax.jit(lambda: jax.vmap(
        functools.partial(idfilter.get_search_region, fp),
        in_axes=(0, None, None, 0, 0, 0))(
            geos, W, H, feats.xy, feats.idepth_mu, feats.idepth_var))()
    off = jnp.float32(pad)
    t("search_stacked", lambda: idfilter.search_stacked(
        fp, geos, jnp.ones_like(feats.idepth_mu), stack.img_pad,
        feats.pf_slot, fnew.img_pad, feats.xy, feats.xy + off,
        reg.start + off, reg.end + off, n_steps),
      lambda o: o.u_cmp[0, 0])
    t("meas_model", lambda: jax.vmap(
        functools.partial(meas_model.idepth_measurement, params.zparams),
        in_axes=(0, None, None, 0, 0))(
            geos, fnew.gradx, fnew.grady, feats.xy, feats.xy),
      lambda o: o[1][0])
    t("project", lambda: jax.vmap(epipolar.project_idepth)(
        geos, feats.xy, feats.idepth_mu), lambda o: o[0][0, 0])


def bench_trackchain():
    """track_project_sync cost from a chain of R dependent dispatches
    (amortizes the +-5 ms RTT noise of single-dispatch timings)."""
    import __graft_entry__ as ge
    from flame_tpu.core import pipeline
    from flame_tpu.params import Params, SolverParams

    params = Params(feature_capacity=4096, edge_capacity=16384,
                    triangle_capacity=12288, poseframe_capacity=16,
                    min_height=-1e6, max_height=1e6,
                    solver=SolverParams(max_vertex_degree=16))
    H, W = 480, 640
    K, Kinv, stack, feats, fnew, _ = ge._synthetic_state(
        params, H, W, n_feat_used=2700)
    R = 8

    def run():
        f = feats
        for _ in range(R):
            f = pipeline.track_project_sync(params, K, Kinv, stack, f,
                                            fnew, 0)[0]
        np.asarray(f.idepth_mu[0])
    print(f"trackchain/step            {timeit(run, inner=R)*1e3:8.2f} ms"
          f" (chain of {R})")


def bench_postprod(g, tris_np, edges_np, n_e, n_used):
    """post_delaunay_step through the PRODUCTION path: packed u16 topo_buf
    (as _host_triangulate builds it) + pallas smoother."""
    from flame_tpu.params import Params, SolverParams
    from flame_tpu.core import pipeline
    from flame_tpu.geometry import se3
    from flame_tpu.optimize import pallas_smoother as ps
    from flame_tpu.optimize import topology

    V, E = g.x.shape[0], 12288
    T_cap = 8192
    params = Params(feature_capacity=V, edge_capacity=E,
                    triangle_capacity=T_cap, poseframe_capacity=16,
                    min_height=-1e6, max_height=1e6,
                    solver=SolverParams(max_vertex_degree=16,
                                        smoother="pallas"))
    H, W = 480, 640
    K = jnp.asarray([[525., 0, 320], [0, 525., 240], [0, 0, 1]], jnp.float32)
    Kinv = jnp.linalg.inv(K)

    # Build the packed u16 buffer exactly like flame._host_triangulate.
    tris_slots = tris_np.astype(np.int64)
    a = tris_slots.reshape(-1)
    b = tris_slots[:, [1, 2, 0]].reshape(-1)
    dcode = np.minimum(a, b) * V + np.maximum(a, b)
    dorder = np.argsort(dcode, kind="stable")
    dsorted = dcode[dorder]
    first = np.ones(dsorted.shape[0], bool)
    first[1:] = dsorted[1:] != dsorted[:-1]
    edge_src = dorder[first][:E]
    ucodes = dsorted[first][: edge_src.shape[0]]
    edges_sorted = np.stack([ucodes // V, ucodes % V], axis=1)
    n_edges = edges_sorted.shape[0]
    member = np.zeros(V, bool)
    member[:n_used] = True
    perm = ps.rcm_order(edges_sorted, n_edges, V, member)
    inv = np.empty(V, np.int32)
    inv[perm] = np.arange(V, dtype=np.int32)
    ranks = ps.perm_edge_ranks(edges_sorted, n_edges, inv, E,
                               params.solver.max_vertex_degree,
                               params.solver.pallas_reach)
    rk = (np.minimum(ranks[:, 0], 255).astype(np.uint16)
          | (np.minimum(ranks[:, 1], 255).astype(np.uint16) << 8))
    buf = np.zeros(2 + 3 * T_cap + 3 * E + V, np.uint16)
    buf[0] = min(tris_np.shape[0], T_cap)
    buf[1] = n_edges
    nt = min(tris_np.shape[0], T_cap)
    buf[2: 2 + 3 * nt] = tris_slots[:nt].reshape(-1)
    buf[2 + 3 * T_cap: 2 + 3 * T_cap + n_edges] = edge_src
    buf[2 + 3 * T_cap + E: 2 + 3 * T_cap + E + n_edges] = rk[:n_edges]
    # Identity host carry (same edge set as the live graph).
    buf[2 + 3 * T_cap + 2 * E: 2 + 3 * T_cap + 3 * E] = 0xFFFF
    buf[2 + 3 * T_cap + 2 * E: 2 + 3 * T_cap + 2 * E + n_edges] = \
        np.arange(n_edges, dtype=np.uint16)
    buf[2 + 3 * T_cap + 3 * E:] = perm.astype(np.uint16)
    buf_d = jnp.asarray(buf)

    curr = pipeline.CurrFeatures(
        xy=g.pos, idepth=g.data_term, var=jnp.full((V,), 1e-3),
        valid=g.vtx_mask)
    pose_prev = (se3.quat_identity(), jnp.zeros(3))
    pose_new = (se3.quat_identity(), jnp.array([0.08, 0.0, 0.0]))
    gg = g._replace(q1=jnp.zeros(E), q2=jnp.zeros(E), q3=jnp.zeros(E),
                    alpha=jnp.zeros(E), beta=jnp.zeros(E),
                    edges=jnp.zeros((E, 2), jnp.int32),
                    edge_mask=jnp.zeros(E, bool))

    import dataclasses
    R = 6
    for n_it in (0, 40):
        pit = dataclasses.replace(
            params, solver=dataclasses.replace(
                params.solver, n_iters_per_frame=n_it))

        def run(pit=pit):
            gr = gg
            for _ in range(R):
                outs = pipeline.post_delaunay_step(
                    pit, K, Kinv, gr, g.vtx_mask, curr, pose_prev,
                    pose_new, jnp.float32(1.0), W, H, None,
                    topo_buf=buf_d)
                gr = outs[0]
            np.asarray(outs[4][0, 0])
        print(f"postprod/pallas            "
              f"{timeit(run, inner=R)*1e3:8.2f} ms "
              f"(incl. {n_it} smooth iters, chain of {R})")


def bench_postparts(g, tris_np, edges_np, n_e, n_used):
    """Chained breakdown of post_delaunay_step's non-smoothing cost:
    topo decode + from_edges, mesh_outputs, rasterize."""
    from flame_tpu.params import Params, SolverParams
    from flame_tpu.core import pipeline
    from flame_tpu.optimize import topology
    from flame_tpu.mesh import filters as mesh_filters
    from flame_tpu.ops import rasterize as raster

    V, E = g.x.shape[0], 12288
    T_cap = 8192
    params = Params(feature_capacity=V, edge_capacity=E,
                    triangle_capacity=T_cap, poseframe_capacity=16,
                    min_height=-1e6, max_height=1e6,
                    solver=SolverParams(max_vertex_degree=16))
    H, W = 480, 640
    K = jnp.asarray([[525., 0, 320], [0, 525., 240], [0, 0, 1]], jnp.float32)
    Kinv = jnp.linalg.inv(K)

    tris = np.zeros((T_cap, 3), np.int32)
    nt = min(tris_np.shape[0], T_cap)
    tris[:nt] = tris_np[:nt]
    tris_d = jnp.asarray(tris)
    tmask = np.zeros(T_cap, bool)
    tmask[:nt] = True
    tmask_d = jnp.asarray(tmask)
    edges_full = np.zeros((E, 2), np.int64)
    ne = min(n_e, E)
    edges_full[:ne] = edges_np[:ne]
    edges_d = jnp.asarray(edges_full.astype(np.int16))
    scale = jnp.float32(1.0)
    R = 8

    def chain(name, f, fetch):
        jf = jax.jit(f)
        def run():
            for _ in range(R):
                out = jf()
            np.asarray(fetch(out))
        print(f"postparts/{name:16s} {timeit(run, inner=R)*1e3:8.2f} ms")

    D = params.solver.max_vertex_degree
    chain("from_edges(pallas)", lambda: topology.from_edges(
        edges_d, jnp.int32(ne), g.pos, g.edges, g.edge_mask,
        g.q1, g.q2, g.q3, E, V, D, build_incidence=False),
        lambda o: o.alpha[0])
    chain("from_edges(vertex)", lambda: topology.from_edges(
        edges_d, jnp.int32(ne), g.pos, g.edges, g.edge_mask,
        g.q1, g.q2, g.q3, E, V, D, build_incidence=True),
        lambda o: o.alpha[0])
    vi = jnp.where(g.vtx_mask, g.x, 0.0)
    chain("mesh_outputs", lambda: pipeline.mesh_outputs(
        params, K, Kinv, W, H, g, tris_d, tmask_d, scale),
        lambda o: o[-1][0, 0])
    chain("rasterize", lambda: raster.rasterize(
        g.pos, tris_d, vi, tmask_d, H, W), lambda o: o[0, 0])
    geom = mesh_filters.corner_geometry(Kinv, g.pos, vi, tris_d)
    chain("normals", lambda: mesh_filters.vertex_normals(
        Kinv, g.pos, vi, tris_d, tmask_d,
        mesh_filters.corner_geometry(Kinv, g.pos, vi, tris_d)),
        lambda o: o[0, 0])
    chain("tri_filters", lambda: mesh_filters.apply_filters(
        params.tri_filter, Kinv, W, g.pos, vi, tris_d, tmask_d,
        mesh_filters.corner_geometry(Kinv, g.pos, vi, tris_d)),
        lambda o: o[0])


def bench_post(g, tris_np, edges_np, n_e, n_used):
    from flame_tpu.params import Params, SolverParams
    from flame_tpu.core import pipeline
    from flame_tpu.geometry import epipolar, se3

    V, E = g.x.shape[0], g.q1.shape[0]
    params = Params(feature_capacity=V, edge_capacity=E,
                    triangle_capacity=12288, poseframe_capacity=16,
                    min_height=-1e6, max_height=1e6,
                    solver=SolverParams(max_vertex_degree=16))
    H, W = 480, 640
    K = jnp.asarray([[525., 0, 320], [0, 525., 240], [0, 0, 1]], jnp.float32)
    Kinv = jnp.linalg.inv(K)
    T_cap = 12288
    tris = np.zeros((T_cap, 3), np.int16)
    tris[:tris_np.shape[0]] = tris_np
    tris_d = jnp.asarray(tris)
    edges_full = np.zeros((E, 2), np.int16)
    edges_full[:n_e] = edges_np
    edges_d = jnp.asarray(edges_full)

    member = g.vtx_mask
    curr = pipeline.CurrFeatures(
        xy=g.pos, idepth=g.data_term, var=jnp.full((V,), 1e-3), valid=member)
    pose_prev = (se3.quat_identity(), jnp.zeros(3))
    pose_new = (se3.quat_identity(), jnp.array([0.08, 0.0, 0.0]))

    from flame_tpu.optimize import topology
    ranks_d = jnp.asarray(topology.build_edge_ranks(edges_np, V, E))

    import dataclasses
    for n_it in (0, params.solver.n_iters_per_frame):
        pit = dataclasses.replace(
            params, solver=dataclasses.replace(
                params.solver, n_iters_per_frame=n_it))

        def run(pit=pit):
            outs = pipeline.post_delaunay_step(
                pit, K, Kinv, g, member, curr, pose_prev, pose_new,
                jnp.float32(1.0), W, H, None,
                tris=tris_d, n_tris=jnp.int32(tris_np.shape[0]),
                edges=edges_d, n_edges=jnp.int32(n_e), edge_ranks=ranks_d)
            np.asarray(outs[4][0, 0])
        print(f"post/post_delaunay_step    {timeit(run)*1e3:8.2f} ms "
              f"(incl. {n_it} smooth iters)")


def main():
    global RTT
    which = set(sys.argv[1:]) or {"all"}
    print(f"device: {jax.devices()[0]}")
    RTT = measure_rtt()
    print(f"rtt: {RTT*1e3:.1f} ms")
    g, edges_np, n_e, tris_np, n_used = make_graph()
    print(f"graph: V=4096 used={n_used} E=16384 used={n_e} "
          f"tris={tris_np.shape[0]}")

    if which & {"all", "smooth"}:
        bench_smooth(g)
    if which & {"all", "mesh"}:
        bench_mesh(g, tris_np, n_used)
    if which & {"all", "topo"}:
        bench_topo(g, edges_np, n_e)
    if which & {"all", "track"}:
        bench_track()
    if which & {"all", "post"}:
        bench_post(g, tris_np, edges_np, n_e, n_used)
    if which & {"all", "trackparts"}:
        bench_trackparts()
    if which & {"all", "trackchain"}:
        bench_trackchain()
    if which & {"all", "postprod"}:
        bench_postprod(g, tris_np, edges_np, n_e, n_used)
    if which & {"all", "postparts"}:
        bench_postparts(g, tris_np, edges_np, n_e, n_used)


if __name__ == "__main__":
    main()
