"""NLTGV2-L1 solver tests: energy decrease, scatter/gather equivalence,
planar-solution recovery. (The reference exposes smoothnessCost/dataCost for
exactly this purpose but never tests its solver; we do.)"""

import numpy as np
import jax
import jax.numpy as jnp

from flame_tpu.optimize import nltgv2
from flame_tpu.params import RegularizerParams


def make_grid_graph(n=6, v_cap=64, e_cap=256, degree=12, noise=0.0,
                    plane=(0.0, 0.0, 1.0), seed=0):
    """n x n grid graph with 4-connectivity; data = plane a*x + b*y + c."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32) * 10,
                         np.arange(n, dtype=np.float32) * 10)
    pos = np.stack([xs.ravel(), ys.ravel()], axis=1)
    V = n * n
    a, b, c = plane
    data = a * pos[:, 0] + b * pos[:, 1] + c
    data = data + noise * rng.normal(size=V).astype(np.float32)

    edges = []
    for i in range(n):
        for j in range(n):
            v = i * n + j
            if j + 1 < n:
                edges.append((v, v + 1))
            if i + 1 < n:
                edges.append((v, v + n))
    edges = np.array(edges, np.int32)
    E = len(edges)

    g = nltgv2.empty(v_cap, e_cap, degree)
    lengths = np.linalg.norm(pos[edges[:, 0]] - pos[edges[:, 1]], axis=1)

    pos_full = np.zeros((v_cap, 2), np.float32)
    pos_full[:V] = pos
    data_full = np.zeros(v_cap, np.float32)
    data_full[:V] = data
    vmask = np.zeros(v_cap, bool)
    vmask[:V] = True
    weight = np.zeros(v_cap, np.float32)
    weight[:V] = 1.0

    edges_full = np.zeros((e_cap, 2), np.int32)
    edges_full[:E] = edges
    alpha = np.zeros(e_cap, np.float32)
    alpha[:E] = 1.0 / lengths
    beta = np.zeros(e_cap, np.float32)
    beta[:E] = 1.0
    emask = np.zeros(e_cap, bool)
    emask[:E] = True

    inc_edge, inc_sign = nltgv2.build_incidence(edges_full, emask, v_cap,
                                                degree)
    src_slot = nltgv2.build_src_slot(inc_edge, inc_sign, e_cap)

    g = g._replace(
        pos=jnp.asarray(pos_full), data_term=jnp.asarray(data_full),
        x=jnp.asarray(data_full), x_bar=jnp.asarray(data_full),
        data_weight=jnp.asarray(weight), vtx_mask=jnp.asarray(vmask),
        edges=jnp.asarray(edges_full), alpha=jnp.asarray(alpha),
        beta=jnp.asarray(beta), edge_mask=jnp.asarray(emask),
        inc_edge=jnp.asarray(inc_edge), inc_sign=jnp.asarray(inc_sign),
        src_slot=jnp.asarray(src_slot))
    return g, V, E


def test_energy_decreases():
    """The true minimized functional (energy(), not the reference's logged
    cost metric) must decrease over the iteration."""
    p = RegularizerParams(step_x=0.01, step_q=12.5)
    g, V, E = make_grid_graph(noise=0.3, seed=1)
    e0 = float(nltgv2.energy(p, g))
    g1 = nltgv2.smooth(p, g, 100)
    e1 = float(nltgv2.energy(p, g1))
    g2 = nltgv2.smooth(p, g1, 400)
    e2 = float(nltgv2.energy(p, g2))
    assert e1 < e0
    assert e2 <= e1 * 1.01  # primal-dual is not strictly monotone


def test_planar_data_is_near_fixed_point():
    """Clean planar data: smoothing should barely change x (NLTGV2 promotes
    affine solutions; data already affine)."""
    p = RegularizerParams()
    g, V, _ = make_grid_graph(noise=0.0, plane=(0.01, -0.005, 2.0))
    g1 = nltgv2.smooth(p, g, 300)
    x0 = np.asarray(g.data_term)[:V]
    x1 = np.asarray(g1.x)[:V]
    np.testing.assert_allclose(x1, x0, atol=0.02)


def test_noise_is_smoothed():
    """Noisy planar data: solution should end closer to the clean plane than
    the noisy data is."""
    # Small data_factor = weak data fidelity = strong smoothing (the proxL1
    # threshold is step_x * data_factor * weight).
    p = RegularizerParams(data_factor=0.01, step_x=0.01, step_q=12.5)
    plane = (0.01, -0.005, 2.0)
    g, V, _ = make_grid_graph(noise=0.25, plane=plane, seed=3)
    pos = np.asarray(g.pos)[:V]
    clean = plane[0] * pos[:, 0] + plane[1] * pos[:, 1] + plane[2]
    noisy_err = np.abs(np.asarray(g.data_term)[:V] - clean).mean()
    g1 = nltgv2.smooth(p, g, 1500)
    sm_err = np.abs(np.asarray(g1.x)[:V] - clean).mean()
    assert sm_err < 0.6 * noisy_err


def test_incidence_matches_segment_sum():
    """The gather-based primal step must agree with the segment-sum scatter
    to float tolerance, iteration by iteration."""
    p = RegularizerParams()
    g, V, E = make_grid_graph(noise=0.3, seed=5)
    ga = g
    gb = g
    for _ in range(5):
        ga = nltgv2.step(p, ga, use_incidence=False)
        gb = nltgv2.step(p, gb, use_incidence=True)
    for name in ("x", "w1", "w2", "x_bar", "q1", "q2", "q3"):
        np.testing.assert_allclose(np.asarray(getattr(ga, name)),
                                   np.asarray(getattr(gb, name)),
                                   atol=1e-5, err_msg=name)


def test_masked_slots_untouched():
    """Vertices/edges beyond the masks must stay exactly zero."""
    p = RegularizerParams()
    g, V, E = make_grid_graph(noise=0.3, seed=7)
    g1 = nltgv2.smooth(p, g, 20)
    assert np.all(np.asarray(g1.x)[V:] == 0)
    assert np.all(np.asarray(g1.w1)[V:] == 0)
    assert np.all(np.asarray(g1.q1)[E:] == 0)


def test_duals_stay_in_unit_ball():
    p = RegularizerParams()
    g, _, E = make_grid_graph(noise=0.5, seed=9)
    g1 = nltgv2.smooth(p, g, 100)
    for q in (g1.q1, g1.q2, g1.q3):
        assert float(jnp.max(jnp.abs(q))) <= 1.0 + 1e-6


def test_x_stays_feasible():
    p = RegularizerParams(x_min=0.0, x_max=0.5)
    g, V, _ = make_grid_graph(noise=2.0, seed=11)
    g1 = nltgv2.smooth(p, g, 100)
    x = np.asarray(g1.x)[:V]
    assert x.min() >= -1e-6 and x.max() <= 0.5 + 1e-6


def test_prox_l1_soft_threshold():
    out = nltgv2._prox_l1(0.0, 10.0, 0.1, 2.0, jnp.array([5.0, 4.9, 4.0]),
                          jnp.array([4.8, 4.8, 4.8]))
    # thresh = 0.2: diff 0.2 -> equals data (boundary), 0.1 -> data, -0.8 -> +thresh
    np.testing.assert_allclose(np.asarray(out), [4.8, 4.8, 4.2], atol=1e-6)


def test_prox_dual_projection():
    out = nltgv2._prox_nltgv2_conj(jnp.array([0.5, -0.5, 3.0, -4.0]))
    np.testing.assert_allclose(np.asarray(out), [0.5, -0.5, 1.0, -1.0],
                               atol=1e-6)


def test_vertex_centric_matches_reference_step():
    """The production vertex-centric one-gather loop must agree with the
    field-per-field reference implementation, including the duals written
    back to the canonical per-edge arrays."""
    p = RegularizerParams()
    g, V, E = make_grid_graph(noise=0.35, seed=41)
    g_ref = g
    for _ in range(25):
        g_ref = nltgv2.step(p, g_ref, use_incidence=False)
    g_vc = nltgv2.smooth(p, g, 25, mode="vertex")
    # atol 1e-4: the vertex-centric loop folds step_q into alpha before the
    # multiply (different float association than the reference's
    # step_q * (alpha * K)).
    for name in ("x", "w1", "w2", "x_bar", "w1_bar", "w2_bar",
                 "q1", "q2", "q3"):
        np.testing.assert_allclose(np.asarray(getattr(g_vc, name)),
                                   np.asarray(getattr(g_ref, name)),
                                   atol=1e-4, err_msg=name)


def test_vertex_centric_resumes_from_carried_duals():
    """Nonzero q state must round-trip through the slot replication /
    write-back (smooth in two halves == smooth once)."""
    p = RegularizerParams()
    g, V, E = make_grid_graph(noise=0.35, seed=43)
    g_once = nltgv2.smooth(p, g, 30, mode="vertex")
    g_half = nltgv2.smooth(p, g, 15, mode="vertex")
    g_twice = nltgv2.smooth(p, g_half, 15, mode="vertex")
    for name in ("x", "w1", "w2", "x_bar", "q1", "q2", "q3"):
        np.testing.assert_allclose(np.asarray(getattr(g_twice, name)),
                                   np.asarray(getattr(g_once, name)),
                                   atol=1e-6, err_msg=name)


def test_stacked_matches_reference_step():
    """The gather-minimized stacked hot loop must agree with the
    field-per-field reference implementation."""
    p = RegularizerParams()
    g, V, E = make_grid_graph(noise=0.35, seed=31)
    g_ref = g
    for _ in range(25):
        g_ref = nltgv2.step(p, g_ref, use_incidence=False)
    g_st = nltgv2.smooth(p, g, 25, stacked=True)
    for name in ("x", "w1", "w2", "x_bar", "w1_bar", "w2_bar",
                 "q1", "q2", "q3"):
        np.testing.assert_allclose(np.asarray(getattr(g_st, name)),
                                   np.asarray(getattr(g_ref, name)),
                                   atol=2e-5, err_msg=name)
