"""Device-side topology derivation tests: edges/incidence from triangles
must match the host reference construction, and dual carry-over must
follow surviving vertex pairs."""

import numpy as np
import jax.numpy as jnp

from flame_tpu.optimize import nltgv2, topology
from scipy.spatial import Delaunay as SDelaunay

V_CAP, E_CAP, DEG, T_CAP = 128, 512, 16, 256


def host_edges(tris):
    s = set()
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            s.add((min(a, b), max(a, b)))
    return sorted(s)


def run_topo(tris_np, pos_np, prev=None):
    T = tris_np.shape[0]
    tris_full = np.zeros((T_CAP, 3), np.int16)
    tris_full[:T] = tris_np
    if prev is None:
        prev_edges = jnp.zeros((E_CAP, 2), jnp.int32)
        prev_mask = jnp.zeros(E_CAP, bool)
        zq = jnp.zeros(E_CAP)
        prev_q = (zq, zq, zq)
    else:
        prev_edges, prev_mask, prev_q = prev
    return topology.from_triangles(
        jnp.asarray(tris_full), jnp.int32(T), jnp.asarray(pos_np),
        prev_edges, prev_mask, *prev_q, E_CAP, V_CAP, DEG)


def make_mesh(rng, n=40):
    pts = rng.uniform(0, 100, size=(n, 2)).astype(np.float32)
    tris = SDelaunay(pts).simplices.astype(np.int64)
    pos = np.zeros((V_CAP, 2), np.float32)
    pos[:n] = pts
    return tris, pos


def test_edges_match_host(rng):
    tris, pos = make_mesh(rng)
    topo = run_topo(tris, pos)
    n_edges = int(topo.n_edges)
    got = sorted((int(a), int(b)) for a, b in
                 np.asarray(topo.edges)[np.asarray(topo.edge_mask)])
    want = host_edges(tris)
    assert got == want
    assert n_edges == len(want)


def test_alpha_is_inverse_length(rng):
    tris, pos = make_mesh(rng)
    topo = run_topo(tris, pos)
    em = np.asarray(topo.edge_mask)
    e = np.asarray(topo.edges)[em]
    lengths = np.linalg.norm(pos[e[:, 0]] - pos[e[:, 1]], axis=1)
    np.testing.assert_allclose(np.asarray(topo.alpha)[em], 1.0 / lengths,
                               rtol=1e-5)


def test_incidence_matches_host(rng):
    tris, pos = make_mesh(rng)
    topo = run_topo(tris, pos)
    edges_full = np.asarray(topo.edges)
    emask = np.asarray(topo.edge_mask)
    want_e, want_s = nltgv2.build_incidence(edges_full, emask, V_CAP, DEG)
    got_e = np.asarray(topo.inc_edge)
    got_s = np.asarray(topo.inc_sign)
    # Per-vertex sets of (edge, sign) must agree (ordering may differ).
    for v in range(V_CAP):
        got = {(int(e), float(s)) for e, s in zip(got_e[v], got_s[v])
               if s != 0}
        want = {(int(e), float(s)) for e, s in zip(want_e[v], want_s[v])
                if s != 0}
        assert got == want, f"vertex {v}"


def test_dual_carry_over(rng):
    tris, pos = make_mesh(rng)
    topo1 = run_topo(tris, pos)
    # Assign recognizable duals.
    em = np.asarray(topo1.edge_mask)
    q1 = jnp.asarray(np.where(em, np.arange(E_CAP) * 0.001, 0.0)
                     .astype(np.float32))
    # Retriangulate with one vertex moved (most edges survive).
    pos2 = pos.copy()
    pos2[5] += 30.0
    n = 40
    tris2 = SDelaunay(pos2[:n]).simplices.astype(np.int64)
    topo2 = run_topo(tris2, pos2, prev=(topo1.edges, topo1.edge_mask,
                                        (q1, q1 * 2, q1 * 3)))
    e1 = {(int(a), int(b)): i for i, (a, b) in
          enumerate(np.asarray(topo1.edges)) if em[i]}
    e2m = np.asarray(topo2.edge_mask)
    q2_1 = np.asarray(topo2.q1)
    for i, (a, b) in enumerate(np.asarray(topo2.edges)):
        if not e2m[i]:
            continue
        key = (int(a), int(b))
        if key in e1:
            np.testing.assert_allclose(q2_1[i], e1[key] * 0.001, atol=1e-7)
        else:
            assert q2_1[i] == 0.0


def test_empty_and_overflow():
    # Zero triangles.
    topo = run_topo(np.zeros((0, 3), np.int64), np.zeros((V_CAP, 2),
                                                         np.float32))
    assert int(topo.n_edges) == 0
    assert not bool(jnp.any(topo.edge_mask))


def test_from_edges_matches_from_triangles(rng):
    """Host-supplied edge lists must produce the same topology as the
    device-side triangle derivation (including dual carry-over)."""
    tris, pos = make_mesh(rng)
    topo_t = run_topo(tris, pos)

    # Host edge list in canonical sorted-code order.
    edges = np.array(host_edges(tris), np.int64)
    order = np.argsort(edges[:, 0] * V_CAP + edges[:, 1])
    edges_sorted = edges[order]
    edges_full = np.zeros((E_CAP, 2), np.int16)
    edges_full[: edges_sorted.shape[0]] = edges_sorted

    # Prior duals to carry.
    em = np.asarray(topo_t.edge_mask)
    q = jnp.asarray(np.where(em, np.arange(E_CAP) * 0.01, 0.0)
                    .astype(np.float32))
    topo_e = topology.from_edges(
        jnp.asarray(edges_full), jnp.int32(edges_sorted.shape[0]),
        jnp.asarray(pos), topo_t.edges, topo_t.edge_mask, q, q * 2, q * 3,
        E_CAP, V_CAP, DEG)

    np.testing.assert_array_equal(np.asarray(topo_e.edges),
                                  np.asarray(topo_t.edges))
    np.testing.assert_array_equal(np.asarray(topo_e.edge_mask),
                                  np.asarray(topo_t.edge_mask))
    np.testing.assert_allclose(np.asarray(topo_e.alpha),
                               np.asarray(topo_t.alpha), rtol=1e-6)
    # Carry: every surviving edge picks up its prior dual.
    np.testing.assert_allclose(np.asarray(topo_e.q1),
                               np.asarray(jnp.where(topo_t.edge_mask, q, 0)),
                               atol=1e-7)
    assert int(topo_e.n_edges) == int(topo_t.n_edges)


def test_rank_based_incidence_matches_argsort(rng):
    """The scatter-only incidence build (host-computed ranks) must produce
    the same per-vertex incidence sets and a consistent src_slot as the
    device argsort build."""
    tris, pos = make_mesh(rng)
    edges = np.array(host_edges(tris), np.int64)
    order = np.argsort(edges[:, 0] * V_CAP + edges[:, 1])
    edges_sorted = edges[order]
    edges_full = np.zeros((E_CAP, 2), np.int16)
    edges_full[: edges_sorted.shape[0]] = edges_sorted
    ranks = topology.build_edge_ranks(edges_sorted, V_CAP, E_CAP)

    prev_edges = jnp.zeros((E_CAP, 2), jnp.int32)
    prev_mask = jnp.zeros(E_CAP, bool)
    zq = jnp.zeros(E_CAP)
    common = (jnp.asarray(edges_full), jnp.int32(edges_sorted.shape[0]),
              jnp.asarray(pos), prev_edges, prev_mask, zq, zq, zq,
              E_CAP, V_CAP, DEG)
    topo_a = topology.from_edges(*common, build_incidence=True)
    topo_r = topology.from_edges(*common, build_incidence=True,
                                 ranks=jnp.asarray(ranks))

    for v in range(V_CAP):
        got = {(int(e), float(s)) for e, s in
               zip(np.asarray(topo_r.inc_edge)[v],
                   np.asarray(topo_r.inc_sign)[v]) if s != 0}
        want = {(int(e), float(s)) for e, s in
                zip(np.asarray(topo_a.inc_edge)[v],
                    np.asarray(topo_a.inc_sign)[v]) if s != 0}
        assert got == want, f"vertex {v}"

    # src_slot must point at a slot holding the edge with sign +1.
    ss = np.asarray(topo_r.src_slot)
    ie = np.asarray(topo_r.inc_edge).reshape(-1)
    isg = np.asarray(topo_r.inc_sign).reshape(-1)
    for e in range(edges_sorted.shape[0]):
        s = ss[e]
        assert s < V_CAP * DEG
        assert ie[s] == e and isg[s] == 1.0, e
