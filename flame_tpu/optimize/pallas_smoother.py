"""Fused Pallas TPU kernel for the NLTGV2-L1 Chambolle-Pock smoother.

The XLA vertex-centric smoother (nltgv2._smooth_vertex_centric) is bound
by gather lowering: one (V, D) neighbor row-gather per iteration costs
~0.17 ms at V=4k/D=16 on v5e (~1.7 ns/row), so 40 iterations/frame eat
~7 ms. XLA has no faster primitive for irregular neighbor access — but
Mosaic lowers a lane-wise `take_along_axis` (axis=-1, equal shapes,
width exactly 128) to native vector shuffles, orders of magnitude
cheaper per element.

This kernel exploits that by banding the graph:

  * Vertices are reordered by reverse Cuthill-McKee (host-side,
    mesh/delaunay + core/flame supply the permutation) so that every
    edge's endpoints land within `reach` 128-rows of each other. Planar
    Delaunay graphs have O(sqrt(V)) bandwidth (~230 measured on dense
    VGA feature meshes -> reach=2 loses nothing); rare violators are
    dropped consistently on both sides (masked inert).
  * Per-vertex state lives in a (R, 128) layout — vertex u at row
    u // 128, lane u % 128. A neighbor within reach rows is read with
    ONE lane-gather from one of 2*reach+1 row-aligned tables (rolled
    copies) — `take_along_axis` at width 128, Mosaic's native case.
  * Per-slot (vertex x incident-edge) state lives in an (R * D, 128)
    layout — slot (u, d) at row (u // 128) * D + d, lane u % 128 — so
    all per-slot math is tile-perfect elementwise VPU work, and the
    per-vertex reduction over D is a sum over D consecutive rows.

All state stays in VMEM for the whole K-iteration loop; per-iteration
HBM traffic is zero. Semantics are exactly the reference's
Chambolle-Pock step (nltgv2_l1_graph_regularizer.cc:33-174), in the
vertex-centric both-copies formulation of nltgv2._smooth_vertex_centric
(each endpoint holds a local copy of its edges' duals; both copies
compute identical updates, so no scatter is ever needed).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flame_tpu.params import RegularizerParams

LANES = 128


def _rows(v_cap: int) -> int:
    assert v_cap % LANES == 0, "pallas smoother needs V % 128 == 0"
    return v_cap // LANES


# ---------------------------------------------------------------------------
# Kernel.
# ---------------------------------------------------------------------------


def _kernel(p: RegularizerParams, n_iters: int, degree: int, reach: int,
            # per-vertex (R, 128)
            x_ref, w1_ref, w2_ref, xb_ref, w1b_ref, w2b_ref,
            data_ref, weight_ref, vmask_ref,
            # per-slot (R*D, 128)
            nbr_loc_ref, rowflag_ref, sdx_ref, sdy_ref, sal_ref, sbe_ref,
            sgn_ref, srcf_ref, q1_ref, q2_ref, q3_ref,
            # outputs
            x_out, w1_out, w2_out, xb_out, w1b_out, w2b_out,
            q1_out, q2_out, q3_out):
    R = x_ref.shape[0]
    D = degree

    nbr = nbr_loc_ref[:]
    rf = rowflag_ref[:]
    sdx = sdx_ref[:]
    sdy = sdy_ref[:]
    sal = sal_ref[:]
    sbe = sbe_ref[:]
    sgn = sgn_ref[:]
    srcf = srcf_ref[:]
    is_src = srcf > 0.0

    sxa = p.step_x * sal
    sxb = p.step_x * sbe
    qa = p.step_q * sal
    qb = p.step_q * sbe
    vmask = vmask_ref[:] > 0.0
    weight = p.data_factor * weight_ref[:]
    data = data_ref[:]

    def rep(v):  # (R, 128) -> (R*D, 128): row r*D+d = v row r
        return jnp.broadcast_to(v[:, None, :], (R, D, LANES)).reshape(
            R * D, LANES)

    def nbr_read(v):
        """Per-slot neighbor value of per-vertex array v: one lane-gather
        per candidate row offset (2 * reach + 1 of them), then select by
        the slot's rowflag. RCM bandwidth on dense VGA meshes reaches
        ~230, so reach=2 (rows within +-2) covers everything measured;
        each extra row costs ~1 us/iteration."""
        out = None
        for k in range(2 * reach + 1):
            shift = (reach - k) % R  # roll by +1 brings the PREVIOUS row
            tab = rep(pltpu.roll(v, shift, 0) if shift else v)
            gk = jnp.take_along_axis(tab, nbr, axis=1)
            out = gk if out is None else jnp.where(rf == k, gk, out)
        return out

    def dsum(v):  # (R*D, 128) -> (R, 128): sum slots per vertex
        return jnp.sum(v.reshape(R, D, LANES), axis=1)

    def body(_, state):
        x, w1, w2, xb, w1b, w2b, q1, q2, q3 = state

        xb_n = nbr_read(xb)
        w1b_n = nbr_read(w1b)
        w2b_n = nbr_read(w2b)
        xb_s = rep(xb)
        w1b_s = rep(w1b)
        w2b_s = rep(w2b)

        # Canonical (src i, dst j) orientation per slot.
        xb_i = jnp.where(is_src, xb_s, xb_n)
        xb_j = jnp.where(is_src, xb_n, xb_s)
        w1b_i = jnp.where(is_src, w1b_s, w1b_n)
        w1b_j = jnp.where(is_src, w1b_n, w1b_s)
        w2b_i = jnp.where(is_src, w2b_s, w2b_n)
        w2b_j = jnp.where(is_src, w2b_n, w2b_s)

        # Dual ascent + unit-ball projection (reference .cc:89-114).
        K1 = (xb_i - xb_j) - sdx * w1b_i - sdy * w2b_i
        nq1 = q1 + qa * K1
        nq1 = nq1 / jnp.maximum(jnp.abs(nq1), 1.0)
        nq2 = q2 + qb * (w1b_i - w1b_j)
        nq2 = nq2 / jnp.maximum(jnp.abs(nq2), 1.0)
        nq3 = q3 + qb * (w2b_i - w2b_j)
        nq3 = nq3 / jnp.maximum(jnp.abs(nq3), 1.0)

        # Primal descent, per-slot contribution to the OWN vertex
        # (reference .cc:116-142 source/target asymmetry).
        d_x = -sgn * nq1 * sxa
        d_w1 = jnp.where(is_src, nq1 * sxa * sdx, 0.0) - sgn * nq2 * sxb
        d_w2 = jnp.where(is_src, nq1 * sxa * sdy, 0.0) - sgn * nq3 * sxb

        nx = x + dsum(d_x)
        nw1 = w1 + dsum(d_w1)
        nw2 = w2 + dsum(d_w2)

        # proxL1 toward the data term (reference .h:179-197).
        diff = nx - data
        thr = p.step_x * weight
        nx = jnp.where(diff > thr, nx - thr,
                       jnp.where(diff < -thr, nx + thr, data))
        nx = jnp.clip(nx, p.x_min, p.x_max)
        nx = jnp.where(vmask, nx, x)
        nw1 = jnp.where(vmask, nw1, w1)
        nw2 = jnp.where(vmask, nw2, w2)

        # Extragradient (reference .cc:156-174).
        nxb = jnp.clip(nx + p.theta * (nx - x), p.x_min, p.x_max)
        nw1b = nw1 + p.theta * (nw1 - w1)
        nw2b = nw2 + p.theta * (nw2 - w2)
        return (nx, nw1, nw2, nxb, nw1b, nw2b, nq1, nq2, nq3)

    init = (x_ref[:], w1_ref[:], w2_ref[:], xb_ref[:], w1b_ref[:],
            w2b_ref[:], q1_ref[:], q2_ref[:], q3_ref[:])
    out = jax.lax.fori_loop(0, n_iters, body, init)
    x_out[:], w1_out[:], w2_out[:] = out[0], out[1], out[2]
    xb_out[:], w1b_out[:], w2b_out[:] = out[3], out[4], out[5]
    q1_out[:], q2_out[:], q3_out[:] = out[6], out[7], out[8]


def run_kernel(p: RegularizerParams, n_iters: int, degree: int,
               vtx, slots, reach: int = 2, interpret: bool = False):
    """vtx: 9-tuple of (R, 128) f32; slots: 11-tuple — nbr_loc (i32),
    rowflag (i32), then 9 f32 (sdx, sdy, sal, sbe, sgn, srcf, q1, q2, q3).
    Returns (x, w1, w2, xb, w1b, w2b) as (R, 128) + (q1, q2, q3) as
    (R*D, 128)."""
    R = vtx[0].shape[0]
    RD = slots[0].shape[0]
    assert RD == R * degree
    f32 = jnp.float32
    outs = ([jax.ShapeDtypeStruct((R, LANES), f32)] * 6
            + [jax.ShapeDtypeStruct((RD, LANES), f32)] * 3)
    kern = functools.partial(_kernel, p, n_iters, degree, reach)
    return pl.pallas_call(
        kern,
        out_shape=outs,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 20,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        interpret=interpret,
    )(*vtx, *slots)


# ---------------------------------------------------------------------------
# Layout build (device-side, pure jnp — fuses into the post-Delaunay jit).
# ---------------------------------------------------------------------------


def build_layout(g, perm, inv_perm, ranks_p, degree: int,
                 reach: int = 2):
    """Banded slot layout from the canonical GraphState + an RCM
    permutation.

    g: nltgv2.GraphState (slot space). perm: (V,) rank -> vertex slot.
    inv_perm: (V,) vertex slot -> rank. ranks_p: (E, 2) int32
    [src_rank, dst_rank] of each edge among its PERMUTED lo/hi vertex's
    slots (host-computed; rank >= degree or band violation -> 255 drops
    the edge from BOTH sides).

    Returns (vtx 9-tuple (R, 128), slots 11-tuple (R*D, 128), src_slot_p
    (E,) flat index of each edge's surviving copy for dual write-back,
    edge_alive (E,) bool).
    """
    V = g.x.shape[0]
    E = g.q1.shape[0]
    D = degree
    R = _rows(V)

    def vperm(a):
        return a[perm].reshape(R, LANES)

    vtx = (vperm(g.x), vperm(g.w1), vperm(g.w2),
           vperm(g.x_bar), vperm(g.w1_bar), vperm(g.w2_bar),
           vperm(g.data_term), vperm(g.data_weight),
           vperm(g.vtx_mask.astype(jnp.float32)))

    lo = g.edges[:, 0]
    hi = g.edges[:, 1]
    lo_p = inv_perm[lo]
    hi_p = inv_perm[hi]
    band_ok = jnp.abs(lo_p // LANES - hi_p // LANES) <= reach
    sr = ranks_p[:, 0]
    dr = ranks_p[:, 1]
    alive = g.edge_mask & band_ok & (sr < D) & (dr < D)

    # Per-edge invariants in canonical (src=lo, dst=hi) orientation.
    d = g.pos[lo] - g.pos[hi]
    dx_e = d[:, 0]
    dy_e = d[:, 1]
    alpha_e = jnp.where(alive, g.alpha, 0.0)
    beta_e = jnp.where(alive, g.beta, 0.0)

    # Flat slot index in the (R*D, 128) layout for vertex rank u, slot d:
    # row = (u // 128) * D + d, lane = u % 128.
    def flat_slot(u, dd):
        return ((u // LANES) * D + dd) * LANES + (u % LANES)

    sent = R * D * LANES
    slot_s = jnp.where(alive, flat_slot(lo_p, sr), sent)
    slot_d = jnp.where(alive, flat_slot(hi_p, dr), sent)

    # Per-edge slot values ride FOUR row-scatters total (int pair + 9
    # float fields, src and dst sides) instead of one scatter per field —
    # TPU scatters cost ~5x gathers per row, so scatter count dominates
    # the layout build.
    NSLOT = R * D * LANES
    zero = jnp.zeros_like(dx_e)
    one = jnp.where(alive, 1.0, 0.0)
    # Row offset of the neighbor relative to the own vertex: 0..2*reach
    # (reach = same row). Dead slots get rowflag `reach` with nbr 0
    # (harmless; every contribution is masked via sal/sbe/sgn = 0).
    rf_s = (hi_p // LANES) - (lo_p // LANES) + reach
    rf_d = (lo_p // LANES) - (hi_p // LANES) + reach

    ibuf = jnp.zeros((NSLOT + 1, 2), jnp.int32).at[:, 1].set(reach)
    ibuf = ibuf.at[slot_s].set(
        jnp.stack([hi_p % LANES, rf_s], axis=1), mode="drop")
    ibuf = ibuf.at[slot_d].set(
        jnp.stack([lo_p % LANES, rf_d], axis=1), mode="drop")
    nbr_loc = ibuf[:-1, 0].reshape(R * D, LANES)
    rowflag = ibuf[:-1, 1].reshape(R * D, LANES)

    fs = jnp.stack([dx_e, dy_e, alpha_e, beta_e, one, one,
                    g.q1, g.q2, g.q3], axis=1)  # src: sgn=+1, srcf=1
    fd = jnp.stack([dx_e, dy_e, alpha_e, beta_e, -one, zero,
                    g.q1, g.q2, g.q3], axis=1)  # dst: sgn=-1, srcf=0
    fbuf = jnp.zeros((NSLOT + 1, 9), jnp.float32)
    fbuf = fbuf.at[slot_s].set(fs, mode="drop")
    fbuf = fbuf.at[slot_d].set(fd, mode="drop")
    fld = [fbuf[:-1, k].reshape(R * D, LANES) for k in range(9)]
    sdx, sdy, sal, sbe, sgn, srcf, q1, q2, q3 = fld

    slots = (nbr_loc, rowflag, sdx, sdy, sal, sbe, sgn, srcf, q1, q2, q3)
    src_slot_p = jnp.where(alive, flat_slot(lo_p, sr), sent)
    return vtx, slots, src_slot_p, alive


def smooth(p: RegularizerParams, g, perm, inv_perm, ranks_p, n_iters: int,
           degree: int, reach: int = 2, interpret: bool = False):
    """Run n_iters fused Chambolle-Pock iterations; returns an updated
    GraphState (slot space). Edges dropped by the band/degree limits keep
    their carried duals but contribute nothing this frame (their alpha
    in g is untouched — only the kernel sees them as dead)."""
    V = g.x.shape[0]
    R = _rows(V)
    vtx, slots, src_slot_p, alive = build_layout(g, perm, inv_perm,
                                                 ranks_p, degree, reach)
    outs = run_kernel(p, n_iters, degree, vtx, slots, reach=reach,
                      interpret=interpret)
    x, w1, w2, xb, w1b, w2b = [o.reshape(V)[inv_perm] for o in outs[:6]]

    def unslot(qs):
        return jnp.pad(qs.reshape(-1), (0, 1))[src_slot_p]

    q1 = jnp.where(alive, unslot(outs[6]), g.q1)
    q2 = jnp.where(alive, unslot(outs[7]), g.q2)
    q3 = jnp.where(alive, unslot(outs[8]), g.q3)
    em = g.edge_mask
    return g._replace(x=x, w1=w1, w2=w2, x_bar=xb, w1_bar=w1b, w2_bar=w2b,
                      q1=jnp.where(em, q1, 0.0),
                      q2=jnp.where(em, q2, 0.0),
                      q3=jnp.where(em, q3, 0.0))


# ---------------------------------------------------------------------------
# Host-side helpers (numpy; run in the fetch worker thread).
# ---------------------------------------------------------------------------


def rcm_order(edges: np.ndarray, n_valid_edges: int, v_cap: int,
              member: np.ndarray) -> np.ndarray:
    """Bandwidth-reducing vertex ordering: perm (V,) rank -> vertex slot.

    Members are ordered by reverse Cuthill-McKee over the edge graph
    (scipy when available, BFS fallback); non-members fill the tail.
    """
    e = edges[:n_valid_edges]
    perm_members = _rcm(e, v_cap, member)
    # _rcm returns exactly the member nodes, so the non-member tail is
    # disjoint by construction.
    rest = np.nonzero(~member)[0]
    perm = np.concatenate([perm_members, rest]).astype(np.int32)
    assert perm.shape[0] == v_cap
    return perm


def _rcm(e: np.ndarray, v_cap: int, member: np.ndarray) -> np.ndarray:
    nodes = np.nonzero(member)[0]
    try:
        import scipy.sparse as sp
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        n = nodes.shape[0]
        dense_id = np.full(v_cap, -1, np.int64)
        dense_id[nodes] = np.arange(n)
        a = dense_id[e[:, 0]]
        b = dense_id[e[:, 1]]
        ok = (a >= 0) & (b >= 0)
        A = sp.coo_matrix((np.ones(ok.sum(), np.int8), (a[ok], b[ok])),
                          shape=(n, n)).tocsr()
        A = A + A.T
        order = reverse_cuthill_mckee(A, symmetric_mode=True)
        return nodes[order].astype(np.int32)
    except ImportError:
        return _bfs_order(e, v_cap, nodes)


def _bfs_order(e: np.ndarray, v_cap: int, nodes: np.ndarray) -> np.ndarray:
    """Plain BFS ordering fallback (bounded-degree planar graphs get
    near-sqrt bandwidth from BFS levels)."""
    import collections
    adj = collections.defaultdict(list)
    nodeset = set(int(x) for x in nodes)
    for a, b in e:
        a, b = int(a), int(b)
        if a in nodeset and b in nodeset:
            adj[a].append(b)
            adj[b].append(a)
    seen = set()
    order = []
    for seed in nodes:
        s = int(seed)
        if s in seen:
            continue
        dq = collections.deque([s])
        seen.add(s)
        while dq:
            u = dq.popleft()
            order.append(u)
            for w in sorted(adj[u]):
                if w not in seen:
                    seen.add(w)
                    dq.append(w)
    return np.asarray(order, np.int32)


def perm_edge_ranks(edges: np.ndarray, n_e: int, inv_perm: np.ndarray,
                    e_cap: int, degree: int,
                    reach: int = 2, tie=None) -> np.ndarray:
    """(E, 2) uint8 [src_rank, dst_rank] of each edge among its permuted
    lo/hi vertex's incident edges. Edges violating the 127-rank band or
    overflowing `degree` on EITHER side get 255 on both (dropped
    consistently — unlike one-sided truncation, this keeps the two dual
    copies identical). tie: optional per-edge sort key (e.g. length)
    ordering each vertex's incident edges within its slot block, so
    degree overflow drops the weakest couplings first."""
    ranks = np.full((e_cap, 2), 255, np.uint8)
    if n_e == 0:
        return ranks
    lo_p = inv_perm[edges[:n_e, 0]].astype(np.int64)
    hi_p = inv_perm[edges[:n_e, 1]].astype(np.int64)
    v_cap = inv_perm.shape[0]
    band_ok = np.abs(lo_p // LANES - hi_p // LANES) <= reach

    from flame_tpu.optimize.topology import rank_within
    sr = rank_within(lo_p, tie)
    # dst entries live ABOVE the vertex's src entries in its slot range so
    # the two never collide (same scheme as topology.build_edge_ranks).
    n_src = np.bincount(lo_p, minlength=v_cap)
    dr = n_src[hi_p] + rank_within(hi_p, tie)
    ok = band_ok & (sr < degree) & (dr < degree)
    ranks[:n_e, 0] = np.where(ok, sr, 255).astype(np.uint8)
    ranks[:n_e, 1] = np.where(ok, dr, 255).astype(np.uint8)
    return ranks
