"""In-kernel RDMA halo exchange: the multi-chip fused NLTGV2 smoother.

parallel/halo.py partitions the RCM-ordered vertices across devices and
ppermutes boundary strips between XLA-level iterations — correct, but
each iteration pays an XLA collective launch and the per-vertex state
round-trips through HBM. This module is the pod-slice production path:
ONE Pallas kernel per device runs the full K-iteration Chambolle-Pock
loop with all state VMEM-resident (like optimize/pallas_smoother.py) and
exchanges the boundary strips over the ICI with 2 async remote DMAs per
iteration (pltpu.make_async_remote_copy) into parity double-buffered
receive slots, so a fast device never overwrites a strip its neighbor is
still reading.

Topology: vertices in RCM rank space, rows of 128 lanes, row-blocks
assigned contiguously to the 1-D device mesh axis. The RCM band
guarantees every edge spans <= `reach` rows, so each device only ever
needs `reach` halo rows from each neighbor. Per iteration per device the
wire traffic is 2 * (3 fields * reach rows * 128 lanes * 4 B) = 3 KB at
reach=2 — constant in V, vs the O(V) psum of the edge-sharded smoother.

Ring semantics: the exchange is cyclic; the wrap-around halo (device 0's
"left" strip) carries garbage, but no edge references it — band_ok in
build_layout drops edges whose GLOBAL ranks differ by more than reach
rows, and the first/last blocks are R/n - reach rows apart.

Iteration structure (symmetric SPMD — every device runs the same code):

  for it in range(n_iters):
    1. RDMA my top own rows -> left neighbor's receive slot [it%2],
       my bottom own rows -> right neighbor's; wait (send + symmetric
       recv: my two strips for this iteration have arrived).
    2. copy the parity slot into the halo rows of the extended state.
    3. compute: dual ascent + primal descent + prox + extragradient on
       my block, reading neighbor xb/w1b/w2b through the halo rows.

No handshake is needed: a device can run at most ONE iteration ahead of
its neighbors (its iteration k+1 strips require its compute k, which
required the neighbors' k strips), so parity double-buffered receive
slots are race-free — when a device writes slot k%2 for iteration k+2,
the receiver has necessarily finished the compute that read that slot.

Verified in interpret mode on a virtual CPU mesh against the single-chip
Pallas kernel (tests/test_pallas_halo.py); real-chip validation needs a
multi-chip slice (this machine tunnels exactly one).

Reference semantics: nltgv2_l1_graph_regularizer.cc:33-174, identical to
optimize/pallas_smoother._kernel.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flame_tpu.params import RegularizerParams
from flame_tpu.optimize import pallas_smoother as ps

LANES = ps.LANES

# ICI traffic of the most recently TRACED smooth_sharded configuration
# (assigned at trace time only — cached executions do not update it;
# for multi-config telemetry call traffic_model directly).
LAST_TRAFFIC = None


def traffic_model(V: int, n_dev: int, n_iters: int, reach: int,
                  dtype_bytes: int = 4) -> dict:
    """Analytical ICI traffic of one smooth_sharded call — exact: per
    iteration each device issues 2 async remote DMAs carrying its top
    and bottom `reach` rank-rows of the 3 bar-state fields (128 lanes),
    INDEPENDENT of V. Boundary scaling; per-device compute scales with
    its row block R/n."""
    strip = reach * LANES * 3 * dtype_bytes
    R = ps._rows(V)
    return {
        "smoother": "pallas_halo",
        "n_devices": n_dev,
        "block_rows_per_device": R // n_dev,  # rank rows of 128 lanes
        "collectives_per_iter": 2,  # two remote DMAs (up + down strip)
        "bytes_per_device_per_iter": 2 * strip,
        "bytes_per_device_total": 2 * strip * n_iters,
        "bytes_all_devices_total": 2 * strip * n_iters * n_dev,
    }


def _halo_kernel(p: RegularizerParams, n_iters: int, degree: int,
                 reach: int, axis: str,
                 # per-vertex (Rb, 128) inputs
                 x_ref, w1_ref, w2_ref, xb_ref, w1b_ref, w2b_ref,
                 data_ref, weight_ref, vmask_ref,
                 # per-slot (Rb*D, 128) inputs
                 nbr_loc_ref, rowflag_ref, sdx_ref, sdy_ref, sal_ref,
                 sbe_ref, sgn_ref, srcf_ref, q1_ref, q2_ref, q3_ref,
                 # outputs
                 x_out, w1_out, w2_out, xb_out, w1b_out, w2b_out,
                 q1_out, q2_out, q3_out,
                 # scratch
                 be_ref, rx_ref, send_sem, recv_sem):
    """be_ref: (3, Rb + 2*reach, 128) extended xb/w1b/w2b with halo rows
    [0:reach] (from the left neighbor) and [Rb+reach:] (from the right);
    own rows at [reach : Rb+reach]. rx_ref: (2, 2, 3, reach, 128) parity
    double-buffered receive slots [it%2][0=from left, 1=from right]."""
    Rb = x_ref.shape[0]
    D = degree
    r = reach

    my = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    left = jax.lax.rem(my + n - 1, n)
    right = jax.lax.rem(my + 1, n)

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

    # Working state in the output refs (mutated across iterations).
    x_out[:] = x_ref[:]
    w1_out[:] = w1_ref[:]
    w2_out[:] = w2_ref[:]
    q1_out[:] = q1_ref[:]
    q2_out[:] = q2_ref[:]
    q3_out[:] = q3_ref[:]
    be_ref[0, r:Rb + r] = xb_ref[:]
    be_ref[1, r:Rb + r] = w1b_ref[:]
    be_ref[2, r:Rb + r] = w2b_ref[:]

    def rep(v):  # (Rb, 128) -> (Rb*D, 128)
        return jnp.broadcast_to(v[:, None, :], (Rb, D, LANES)).reshape(
            Rb * D, LANES)

    def nbr_read(vE):
        """Per-slot neighbor value from an EXTENDED (Rb+2r, 128) array:
        own row i sits at extended row i+r; a slot with rowflag k reads
        extended rows [k : k+Rb] — a static slice per candidate offset,
        selected by rowflag."""
        out = None
        for k in range(2 * r + 1):
            tab = rep(vE[k: k + Rb])
            gk = jnp.take_along_axis(tab, nbr, axis=1)
            out = gk if out is None else jnp.where(rf == k, gk, out)
        return out

    def dsum(v):
        return jnp.sum(v.reshape(Rb, D, LANES), axis=1)

    def body(it, carry):
        par = jax.lax.rem(it, 2)

        # --- 1. Exchange boundary strips of the extragradient state.
        # My top own rows -> left neighbor's "from right" slot; symmetric
        # recv: my own slots fill from my two neighbors' sends.
        to_left = pltpu.make_async_remote_copy(
            src_ref=be_ref.at[:, r: 2 * r],
            dst_ref=rx_ref.at[par, 1],
            send_sem=send_sem.at[par, 0], recv_sem=recv_sem.at[par, 0],
            device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL)
        to_right = pltpu.make_async_remote_copy(
            src_ref=be_ref.at[:, Rb: Rb + r],
            dst_ref=rx_ref.at[par, 0],
            send_sem=send_sem.at[par, 1], recv_sem=recv_sem.at[par, 1],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
        to_left.start()
        to_right.start()
        to_left.wait()
        to_right.wait()

        # --- 2. Install the fresh halos.
        be_ref[:, 0: r] = rx_ref[par, 0]
        be_ref[:, Rb + r: Rb + 2 * r] = rx_ref[par, 1]

        # --- 3. Compute (identical math to pallas_smoother._kernel).
        x = x_out[:]
        w1 = w1_out[:]
        w2 = w2_out[:]
        q1 = q1_out[:]
        q2 = q2_out[:]
        q3 = q3_out[:]
        xbE = be_ref[0]
        w1bE = be_ref[1]
        w2bE = be_ref[2]
        xb = xbE[r: Rb + r]
        w1b = w1bE[r: Rb + r]
        w2b = w2bE[r: Rb + r]

        xb_n = nbr_read(xbE)
        w1b_n = nbr_read(w1bE)
        w2b_n = nbr_read(w2bE)
        xb_s = rep(xb)
        w1b_s = rep(w1b)
        w2b_s = rep(w2b)

        xb_i = jnp.where(is_src, xb_s, xb_n)
        xb_j = jnp.where(is_src, xb_n, xb_s)
        w1b_i = jnp.where(is_src, w1b_s, w1b_n)
        w1b_j = jnp.where(is_src, w1b_n, w1b_s)
        w2b_i = jnp.where(is_src, w2b_s, w2b_n)
        w2b_j = jnp.where(is_src, w2b_n, w2b_s)

        K1 = (xb_i - xb_j) - sdx * w1b_i - sdy * w2b_i
        nq1 = q1 + qa * K1
        nq1 = nq1 / jnp.maximum(jnp.abs(nq1), 1.0)
        nq2 = q2 + qb * (w1b_i - w1b_j)
        nq2 = nq2 / jnp.maximum(jnp.abs(nq2), 1.0)
        nq3 = q3 + qb * (w2b_i - w2b_j)
        nq3 = nq3 / jnp.maximum(jnp.abs(nq3), 1.0)

        d_x = -sgn * nq1 * sxa
        d_w1 = jnp.where(is_src, nq1 * sxa * sdx, 0.0) - sgn * nq2 * sxb
        d_w2 = jnp.where(is_src, nq1 * sxa * sdy, 0.0) - sgn * nq3 * sxb

        nx = x + dsum(d_x)
        nw1 = w1 + dsum(d_w1)
        nw2 = w2 + dsum(d_w2)

        diff = nx - data
        thr = p.step_x * weight
        nx = jnp.where(diff > thr, nx - thr,
                       jnp.where(diff < -thr, nx + thr, data))
        nx = jnp.clip(nx, p.x_min, p.x_max)
        nx = jnp.where(vmask, nx, x)
        nw1 = jnp.where(vmask, nw1, w1)
        nw2 = jnp.where(vmask, nw2, w2)

        x_out[:] = nx
        w1_out[:] = nw1
        w2_out[:] = nw2
        q1_out[:] = nq1
        q2_out[:] = nq2
        q3_out[:] = nq3
        be_ref[0, r: Rb + r] = jnp.clip(nx + p.theta * (nx - x),
                                        p.x_min, p.x_max)
        be_ref[1, r: Rb + r] = nw1 + p.theta * (nw1 - w1)
        be_ref[2, r: Rb + r] = nw2 + p.theta * (nw2 - w2)
        return carry

    jax.lax.fori_loop(0, n_iters, body, 0)
    xb_out[:] = be_ref[0, r: Rb + r]
    w1b_out[:] = be_ref[1, r: Rb + r]
    w2b_out[:] = be_ref[2, r: Rb + r]


def _block_call(p, n_iters, degree, reach, axis, interpret, *args):
    vtx_b, slots_b = args[:9], args[9:]
    Rb = vtx_b[0].shape[0]
    RbD = slots_b[0].shape[0]
    assert RbD == Rb * degree
    f32 = jnp.float32
    outs = ([jax.ShapeDtypeStruct((Rb, LANES), f32)] * 6
            + [jax.ShapeDtypeStruct((RbD, LANES), f32)] * 3)
    kern = functools.partial(_halo_kernel, p, n_iters, degree, reach, axis)
    return pl.pallas_call(
        kern,
        out_shape=outs,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 20,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        scratch_shapes=[
            pltpu.VMEM((3, Rb + 2 * reach, LANES), f32),
            pltpu.VMEM((2, 2, 3, reach, LANES), f32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(*vtx_b, *slots_b)


def smooth_sharded(p: RegularizerParams, g, perm, inv_perm, ranks_p,
                   n_iters: int, degree: int, mesh: Mesh,
                   axis: str = "graph", reach: int = 2,
                   interpret: bool = False):
    """Multi-chip drop-in for pallas_smoother.smooth: same GraphState in,
    same GraphState out, vertex row-blocks sharded over `mesh[axis]`.

    The banded layout is built at the XLA level (sharded by rows), the
    K-iteration loop + halo exchange runs inside one kernel per device.
    """
    V = g.x.shape[0]
    R = ps._rows(V)
    n_dev = mesh.shape[axis]
    assert R % n_dev == 0, (R, n_dev)
    assert R // n_dev >= reach, ("block must cover the halo", R, n_dev)
    global LAST_TRAFFIC
    LAST_TRAFFIC = traffic_model(V, int(n_dev), n_iters, reach)

    vtx, slots, src_slot_p, alive = ps.build_layout(
        g, perm, inv_perm, ranks_p, degree, reach)

    shard = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None),) * 20,
        out_specs=(P(axis, None),) * 9,
        check_vma=False)

    outs = shard(functools.partial(
        _block_call, p, n_iters, degree, reach, axis, interpret))(
            *vtx, *slots)

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
