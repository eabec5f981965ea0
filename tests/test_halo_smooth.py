"""Vertex-partitioned halo-exchange smoother vs the reference step
(8 virtual CPU devices via conftest; mesh over 4 of them)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from flame_tpu.optimize import nltgv2, pallas_smoother
from flame_tpu.parallel import halo
from flame_tpu.params import RegularizerParams

import tests.test_pallas_smoother as tps

V_CAP = 1024
E_CAP = 4096
DEGREE = 16
HALO = 256


@pytest.fixture(scope="module")
def setup():
    # Reuse the pallas test's graph builder at a larger capacity.
    tps_v, tps_e = tps.V_CAP, tps.E_CAP
    tps.V_CAP, tps.E_CAP = V_CAP, E_CAP
    try:
        g, edges_sorted, n_e, member = tps._make_graph(seed=3, n_pts=700)
        perm = pallas_smoother.rcm_order(edges_sorted, n_e, V_CAP, member)
        inv = np.empty(V_CAP, np.int32)
        inv[perm] = np.arange(V_CAP, dtype=np.int32)
        ranks = pallas_smoother.perm_edge_ranks(
            edges_sorted, n_e, inv, E_CAP, DEGREE, reach=HALO // 128 - 1)
        assert (ranks[:n_e] < 255).all(), "drops in test graph"
    finally:
        tps.V_CAP, tps.E_CAP = tps_v, tps_e
    return g, jnp.asarray(perm), jnp.asarray(inv), jnp.asarray(ranks)


def test_matches_reference_step(setup):
    g, perm, inv, ranks = setup
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]), (halo.AXIS,))
    p = RegularizerParams()

    ref = nltgv2.smooth(p, g, 6, mode="step")
    out = halo.halo_smooth(p, g, perm, inv, ranks, 6, DEGREE, mesh,
                           halo=HALO)

    vm = np.asarray(g.vtx_mask)
    em = np.asarray(g.edge_mask)
    for name in ("x", "w1", "w2", "x_bar"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name))[vm],
            np.asarray(getattr(ref, name))[vm],
            rtol=2e-5, atol=5e-6, err_msg=name)
    for name in ("q1", "q2", "q3"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, name))[em],
            np.asarray(getattr(ref, name))[em],
            rtol=2e-4, atol=5e-5, err_msg=name)


def test_energy_decreases(setup):
    g, perm, inv, ranks = setup
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]), (halo.AXIS,))
    p = RegularizerParams()
    e0 = float(nltgv2.energy(p, g))
    out = halo.halo_smooth(p, g, perm, inv, ranks, 60, DEGREE, mesh,
                           halo=HALO)
    assert float(nltgv2.energy(p, out)) < e0
