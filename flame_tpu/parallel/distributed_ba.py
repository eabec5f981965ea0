"""Distributed windowed BA: observation-sharded normal-equation assembly.

The Schur assembly (flame_tpu/ba/schur.py) is segment-sums over
observations, so it distributes as classic data parallelism: each device
assembles partial (Hpp, bp, Hll, bl, W) from its observation shard and one
psum over the ICI combines them; the tiny reduced solve then runs
replicated on every device. This is the "reduce off-diagonal BA blocks
over ICI collectives" layer of the north star (BASELINE.json).
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from flame_tpu.ba import residuals as resid
from flame_tpu.ba import schur
from flame_tpu.geometry import se3
from flame_tpu.params import BAParams

AXIS = "graph"


def solve_window_sharded(params: BAParams, K, Kinv,
                         problem: schur.BAProblem, mesh: Mesh,
                         n_fixed: int = 2, sqrtW=None):
    """solve_window with the assembly sharded over the mesh.

    Observation rows are padded (valid=False) up to a multiple of the
    device count, so any window solves here (VERDICT r2 #3 removed the
    silent divisibility fallback). sqrtW is per-observation whitening
    ((M, 2, 2), ba/rematch.observation_weights) and shards with the
    observations. Numerically equivalent to the single-device solve up
    to float reduction order.
    """
    P_n = problem.q.shape[0]
    L = problem.lm_idepth.shape[0]
    n_dev = mesh.devices.size
    M = problem.obs.u_ref.shape[0]
    pad = (-M) % n_dev
    if pad:
        obs = problem.obs
        padded = resid.BAObservations(
            anchor_idx=jnp.pad(obs.anchor_idx, (0, pad)),
            obs_idx=jnp.pad(obs.obs_idx, (0, pad)),
            lm_idx=jnp.pad(obs.lm_idx, (0, pad)),
            u_ref=jnp.pad(obs.u_ref, ((0, pad), (0, 0))),
            u_obs=jnp.pad(obs.u_obs, ((0, pad), (0, 0))),
            valid=jnp.pad(obs.valid, (0, pad)))
        problem = problem._replace(obs=padded)
        if sqrtW is not None:
            sqrtW = jnp.pad(sqrtW, ((0, pad), (0, 0), (0, 0)))

    rep = P()
    oshard = resid.BAObservations(
        anchor_idx=P(AXIS), obs_idx=P(AXIS), lm_idx=P(AXIS),
        u_ref=P(AXIS), u_obs=P(AXIS), valid=P(AXIS))

    # One sharded assembly path: absent whitening is the identity (the
    # (M, 2, 2) broadcast is noise next to the Jacobian work).
    if sqrtW is None:
        sqrtW = jnp.broadcast_to(
            jnp.eye(2, dtype=jnp.float32),
            (problem.obs.u_ref.shape[0], 2, 2))

    def assemble_body(q, t, lm, obs, sw):
        Hpp, bp, Hll, bl, W, cost = schur._assemble(
            K, Kinv, q, t, lm, obs, params.huber_delta, P_n, L, sqrtW=sw)
        return (jax.lax.psum(Hpp, AXIS), jax.lax.psum(bp, AXIS),
                jax.lax.psum(Hll, AXIS), jax.lax.psum(bl, AXIS),
                jax.lax.psum(W, AXIS), jax.lax.psum(cost, AXIS))

    assemble_sm = jax.shard_map(
        assemble_body, mesh=mesh,
        in_specs=(rep, rep, rep, oshard, P(AXIS)),
        out_specs=(rep, rep, rep, rep, rep, rep))
    sqrtW_arr = sqrtW

    def assemble(q, t, lm, obs):
        return assemble_sm(q, t, lm, obs, sqrtW_arr)

    prior_q = problem.prior_q if problem.prior_q is not None else problem.q
    prior_t = problem.prior_t if problem.prior_t is not None else problem.t

    @jax.jit
    def run(problem):
        def body(_, state):
            q, t, lm = state
            Hpp, bp, Hll, bl, W, _ = assemble(q, t, lm, problem.obs)
            if params.pose_prior_weight > 0:
                e = jax.vmap(lambda qq, tt, pq, pt: se3.log(
                    se3.mul((qq, tt), se3.inverse((pq, pt)))))(
                        q, t, prior_q, prior_t)
                w = params.pose_prior_weight
                bp = bp + w * e
                Hpp = Hpp + w * jnp.eye(6)[None, None] * \
                    jnp.eye(P_n)[:, :, None, None]
            dx_p, dx_l = schur._solve_reduced(
                Hpp, bp, Hll, bl, W, params.damping, n_fixed,
                problem.lm_valid)
            qn, tn = jax.vmap(
                lambda xi, qq, tt: se3.mul(se3.exp(xi), (qq, tt)))(dx_p, q, t)
            lmn = jnp.clip(lm + dx_l, 1e-4, 1e3)
            lmn = jnp.where(problem.lm_valid, lmn, lm)
            return qn, tn, lmn

        q, t, lm = jax.lax.fori_loop(
            0, params.n_gn_iters, body,
            (problem.q, problem.t, problem.lm_idepth))
        *_, cost = assemble(q, t, lm, problem.obs)
        return q, t, lm, cost

    return run(problem)
