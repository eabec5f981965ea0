"""New-vertex initialization parity (reference flame.cc:2123-2163):
under init_with_prediction, a new vertex whose dense-map prediction is NaN
initializes from the mean smoothed idepth of its surviving neighbors, and
only falls back to the data term when it has none."""

import numpy as np
import jax.numpy as jnp

from flame_tpu.core import pipeline
from flame_tpu.geometry import camera, se3
from flame_tpu.optimize import nltgv2
from flame_tpu.params import Params, SolverParams


def _run_sync(prev_map_value):
    V, E, T = 8, 16, 8
    W, H = 64, 48
    params = Params(
        feature_capacity=V, edge_capacity=E, triangle_capacity=T,
        poseframe_capacity=2, min_height=-1e6, max_height=1e6,
        init_with_prediction=True,
        solver=SolverParams(n_iters_per_frame=0, max_vertex_degree=4,
                            smoother="vertex"))
    K = camera.make_k(50.0, 50.0, W / 2, H / 2)
    Kinv = camera.inv_k(K)

    graph = nltgv2.empty(V, E, 4)
    vmask = np.zeros(V, bool)
    vmask[:2] = True  # survivors 0, 1
    x = np.zeros(V, np.float32)
    x[0], x[1] = 0.3, 0.4
    pos = np.zeros((V, 2), np.float32)
    pos[0] = (10, 10)
    pos[1] = (30, 10)
    pos[2] = (20, 25)
    graph = graph._replace(
        x=jnp.asarray(x), x_bar=jnp.asarray(x),
        pos=jnp.asarray(pos), vtx_mask=jnp.asarray(vmask),
        data_weight=jnp.asarray(vmask.astype(np.float32)))

    member = np.zeros(V, bool)
    member[:3] = True  # vertex 2 is NEW this frame
    curr = pipeline.CurrFeatures(
        xy=jnp.asarray(pos), idepth=jnp.full((V,), 0.7, jnp.float32),
        var=jnp.full((V,), 1e-3, jnp.float32),
        valid=jnp.asarray(member))

    tris = np.zeros((T, 3), np.int64)
    tris[0] = (0, 1, 2)
    edges = np.zeros((E, 2), np.int64)
    edges[:3] = [(0, 1), (0, 2), (1, 2)]  # code-sorted

    ident = (se3.quat_identity(), jnp.zeros(3))
    prev_map = jnp.full((H, W), prev_map_value, jnp.float32)
    out = pipeline.post_delaunay_step(
        params, K, Kinv, graph, jnp.asarray(member), curr, ident, ident,
        jnp.float32(1.0), W, H, prev_idepthmap=prev_map,
        tris=jnp.asarray(tris), n_tris=jnp.int32(1),
        edges=jnp.asarray(edges), n_edges=jnp.int32(3))
    return np.asarray(out[0].x)


def test_neighbor_mean_when_prediction_nan():
    x = _run_sync(np.nan)
    assert abs(x[2] - 0.35) < 1e-5, x[2]
    # Survivors keep their (projected) values, not the data term.
    assert abs(x[0] - 0.3) < 1e-5 and abs(x[1] - 0.4) < 1e-5


def test_prediction_wins_when_valid():
    x = _run_sync(0.55)
    assert abs(x[2] - 0.55) < 1e-5, x[2]
