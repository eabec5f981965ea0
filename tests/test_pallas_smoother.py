"""Pallas fused smoother vs the reference-semantics step smoother.

The banded-lane kernel (optimize/pallas_smoother.py) must reproduce the
field-per-field Chambolle-Pock iteration (nltgv2.step, which mirrors the
reference nltgv2_l1_graph_regularizer.cc:33-174 op-for-op) on a real
Delaunay graph, through the RCM reordering and the (R*D, 128) slot
layout. Runs in Pallas interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from flame_tpu.mesh import delaunay
from flame_tpu.optimize import nltgv2, pallas_smoother
from flame_tpu.params import RegularizerParams

V_CAP = 256
E_CAP = 1024
DEGREE = 16


def _make_graph(seed=0, n_pts=200):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(5, 250, (n_pts, 2)).astype(np.float32)
    tri = delaunay.triangulate(pts)
    slots = rng.permutation(V_CAP)[:n_pts].astype(np.int32)

    edges_slots = np.sort(slots[tri.edges], axis=1)
    order = np.argsort(edges_slots[:, 0].astype(np.int64) * V_CAP
                       + edges_slots[:, 1])
    edges_sorted = edges_slots[order]
    n_e = edges_sorted.shape[0]

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
    g = g._replace(x_bar=g.x, w1_bar=g.w1, w2_bar=g.w2)
    return g, edges_sorted, n_e, member


def _perm_inputs(edges_sorted, n_e, member):
    perm = pallas_smoother.rcm_order(edges_sorted, n_e, V_CAP, member)
    inv = np.empty(V_CAP, np.int32)
    inv[perm] = np.arange(V_CAP, dtype=np.int32)
    ranks = pallas_smoother.perm_edge_ranks(edges_sorted, n_e, inv, E_CAP,
                                            DEGREE)
    return (jnp.asarray(perm), jnp.asarray(inv), jnp.asarray(ranks),
            perm, inv, ranks)


@pytest.fixture(scope="module")
def setup():
    g, edges_sorted, n_e, member = _make_graph()
    perm_d, inv_d, ranks_d, perm, inv, ranks = _perm_inputs(
        edges_sorted, n_e, member)
    # Preconditions for an exact comparison: nothing dropped.
    assert (ranks[:n_e] < 255).all(), "band/degree drops in test graph"
    return g, perm_d, inv_d, ranks_d, n_e


@pytest.mark.parametrize("n_iters", [1, 7])
def test_matches_reference_step(setup, n_iters):
    g, perm_d, inv_d, ranks_d, n_e = setup
    p = RegularizerParams()

    ref = nltgv2.smooth(p, g, n_iters, mode="step")
    out = pallas_smoother.smooth(p, g, perm_d, inv_d, ranks_d, n_iters,
                                 DEGREE, interpret=True)

    vm = np.asarray(g.vtx_mask)
    em = np.asarray(g.edge_mask)
    for name in ("x", "w1", "w2", "x_bar", "w1_bar", "w2_bar"):
        a = np.asarray(getattr(ref, name))[vm]
        b = np.asarray(getattr(out, name))[vm]
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6, err_msg=name)
    for name in ("q1", "q2", "q3"):
        # Looser: different summation order than the reference step drifts
        # the duals by O(1e-5) absolute over a few iterations.
        a = np.asarray(getattr(ref, name))[em]
        b = np.asarray(getattr(out, name))[em]
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=5e-5, err_msg=name)


def test_zero_iters_identity(setup):
    g, perm_d, inv_d, ranks_d, _ = setup
    p = RegularizerParams()
    out = pallas_smoother.smooth(p, g, perm_d, inv_d, ranks_d, 0, DEGREE,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(g.x))
    np.testing.assert_allclose(np.asarray(out.q1), np.asarray(g.q1))


def test_energy_decreases(setup):
    g, perm_d, inv_d, ranks_d, _ = setup
    p = RegularizerParams()
    e0 = float(nltgv2.energy(p, g))
    out = pallas_smoother.smooth(p, g, perm_d, inv_d, ranks_d, 50, DEGREE,
                                 interpret=True)
    e1 = float(nltgv2.energy(p, out))
    assert e1 < e0
