"""In-kernel RDMA halo smoother (parallel/pallas_halo.py) vs the
single-chip fused Pallas kernel.

Runs in Pallas interpret mode over a virtual CPU device mesh: the remote
DMAs and semaphore handshakes are emulated per shard, so the full
multi-chip iteration structure (handshake -> strip exchange -> compute)
executes and must reproduce the single-kernel result exactly — every
device sees the same xb/w1b/w2b values an undistributed iteration would.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from flame_tpu.mesh import delaunay
from flame_tpu.optimize import nltgv2, pallas_smoother
from flame_tpu.parallel import pallas_halo
from flame_tpu.params import RegularizerParams

V_CAP = 1024  # 8 rank-rows: blocks of >= reach rows up to 4 devices
E_CAP = 4096
DEGREE = 16


def _make_graph(seed=0, n_pts=700):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(5, 500, (n_pts, 2)).astype(np.float32)
    tri = delaunay.triangulate(pts)
    slots = rng.permutation(V_CAP)[:n_pts].astype(np.int32)

    edges_slots = np.sort(slots[tri.edges], axis=1)
    order = np.argsort(edges_slots[:, 0].astype(np.int64) * V_CAP
                       + edges_slots[:, 1])
    edges_sorted = edges_slots[order]
    n_e = edges_sorted.shape[0]
    assert n_e <= E_CAP

    g = nltgv2.empty(V_CAP, E_CAP, DEGREE)
    pos = np.zeros((V_CAP, 2), np.float32)
    pos[slots] = pts
    member = np.zeros(V_CAP, bool)
    member[slots] = True

    edges_full = np.zeros((E_CAP, 2), np.int64)
    edges_full[:n_e] = edges_sorted
    edge_mask = np.arange(E_CAP) < n_e
    d = pos[edges_full[:, 0]] - pos[edges_full[:, 1]]
    length = np.sqrt((d * d).sum(1))
    alpha = np.where(edge_mask & (length > 1e-6),
                     1.0 / np.maximum(length, 1e-6), 0.0)

    g = g._replace(
        pos=jnp.asarray(pos),
        x=jnp.asarray(np.where(member, rng.uniform(0.5, 2.0, V_CAP), 0.0),
                      jnp.float32),
        w1=jnp.asarray(np.where(member, rng.normal(0, 0.01, V_CAP), 0.0),
                       jnp.float32),
        w2=jnp.asarray(np.where(member, rng.normal(0, 0.01, V_CAP), 0.0),
                       jnp.float32),
        data_term=jnp.asarray(
            np.where(member, rng.uniform(0.5, 2.0, V_CAP), 0.0),
            jnp.float32),
        data_weight=jnp.asarray(member.astype(np.float32)),
        vtx_mask=jnp.asarray(member),
        edges=jnp.asarray(edges_full, jnp.int32),
        alpha=jnp.asarray(alpha, jnp.float32),
        beta=jnp.asarray(np.where(edge_mask, 1.0, 0.0), jnp.float32),
        q1=jnp.asarray(np.where(edge_mask, rng.uniform(-0.5, 0.5, E_CAP),
                                0.0), jnp.float32),
        q2=jnp.asarray(np.where(edge_mask, rng.uniform(-0.5, 0.5, E_CAP),
                                0.0), jnp.float32),
        q3=jnp.asarray(np.where(edge_mask, rng.uniform(-0.5, 0.5, E_CAP),
                                0.0), jnp.float32),
        edge_mask=jnp.asarray(edge_mask))
    return g._replace(x_bar=g.x, w1_bar=g.w1, w2_bar=g.w2), \
        edges_sorted, n_e, member


def _perm_inputs(edges_sorted, n_e, member):
    perm = pallas_smoother.rcm_order(edges_sorted, n_e, V_CAP, member)
    inv = np.empty(V_CAP, np.int32)
    inv[perm] = np.arange(V_CAP, dtype=np.int32)
    ranks = pallas_smoother.perm_edge_ranks(edges_sorted, n_e, inv, E_CAP,
                                            DEGREE)
    return jnp.asarray(perm), jnp.asarray(inv), jnp.asarray(ranks)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_matches_single_chip_kernel(n_dev):
    p = RegularizerParams()
    g, edges_sorted, n_e, member = _make_graph(seed=3)
    perm, inv, ranks = _perm_inputs(edges_sorted, n_e, member)

    ref = pallas_smoother.smooth(p, g, perm, inv, ranks, 7, DEGREE,
                                 interpret=True)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("graph",))
    out = pallas_halo.smooth_sharded(p, g, perm, inv, ranks, 7, DEGREE,
                                     mesh, axis="graph", interpret=True)

    for name in ("x", "w1", "w2", "x_bar", "w1_bar", "w2_bar",
                 "q1", "q2", "q3"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6, err_msg=name)


def test_energy_decreases():
    """The distributed solve must still be a descent on the NLTGV2-L1
    energy (reference exposes smoothnessCost/dataCost for this,
    nltgv2...h:139-151)."""
    p = RegularizerParams()
    g, edges_sorted, n_e, member = _make_graph(seed=5)
    perm, inv, ranks = _perm_inputs(edges_sorted, n_e, member)
    mesh = Mesh(np.array(jax.devices()[:2]), ("graph",))

    e0 = float(nltgv2.energy(p, g))
    out = pallas_halo.smooth_sharded(p, g, perm, inv, ranks, 30, DEGREE,
                                     mesh, axis="graph", interpret=True)
    e1 = float(nltgv2.energy(p, out))
    assert e1 < e0, (e0, e1)
