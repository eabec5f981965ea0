"""Schur-complement Gauss-Newton solve for the BA window.

The normal equations have the classic two-block structure

    [ Hpp  Hpl ] [dx_p]   [ -bp ]
    [ Hpl' Hll ] [dx_l] = [ -bl ]

with scalar landmark blocks (inverse depths), so Hll is diagonal and the
reduced pose system S = Hpp - Hpl Hll^-1 Hpl' is tiny (6P x 6P with P <= a
few dozen keyframes). Assembly is pure segment-sum over observations —
the formulation that distributes: shards compute partial H/b from their
observation slice and one psum combines them (parallel/distributed_ba.py).

Gauge freedom (global SE(3) + monocular scale) is removed by freezing the
first `n_fixed` poses in the window.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flame_tpu.ba import residuals as resid
from flame_tpu.geometry import se3
from flame_tpu.params import BAParams


class BAProblem(NamedTuple):
    q: jax.Array  # (P, 4) window poses (camera-to-world)
    t: jax.Array  # (P, 3)
    lm_idepth: jax.Array  # (L,)
    lm_valid: jax.Array  # (L,) bool
    obs: resid.BAObservations
    prior_q: jax.Array = None  # (P, 4) pose-prior anchors (default = q)
    prior_t: jax.Array = None  # (P, 3)


def _assemble(K, Kinv, q, t, lm_idepth, obs, huber_delta, n_poses: int,
              n_lms: int, sqrtW=None):
    """Normal-equation pieces from all observations (segment sums)."""
    r, Ja, Jo, Jd, w = resid.residuals_and_jacobians(
        K, Kinv, q, t, obs, lm_idepth, huber_delta, sqrtW=sqrtW)

    P, L = n_poses, n_lms
    wr = w[:, None] * r  # (M, 2)

    # Pose-pose blocks: contributions for (a,a), (a,o), (o,a), (o,o).
    def pp(Ji, Jj):
        return jnp.einsum("mki,mkj->mij", Ji * w[:, None, None], Jj, precision=jax.lax.Precision.HIGHEST)

    idx_aa = obs.anchor_idx * P + obs.anchor_idx
    idx_ao = obs.anchor_idx * P + obs.obs_idx
    idx_oa = obs.obs_idx * P + obs.anchor_idx
    idx_oo = obs.obs_idx * P + obs.obs_idx
    seg = functools.partial(jax.ops.segment_sum, num_segments=P * P)
    Hpp = (seg(pp(Ja, Ja), idx_aa) + seg(pp(Ja, Jo), idx_ao)
           + seg(pp(Jo, Ja), idx_oa) + seg(pp(Jo, Jo), idx_oo))
    Hpp = Hpp.reshape(P, P, 6, 6)

    # Pose gradient.
    segp = functools.partial(jax.ops.segment_sum, num_segments=P)
    bp = segp(jnp.einsum("mki,mk->mi", Ja, wr, precision=jax.lax.Precision.HIGHEST), obs.anchor_idx) + \
        segp(jnp.einsum("mki,mk->mi", Jo, wr, precision=jax.lax.Precision.HIGHEST), obs.obs_idx)  # (P, 6)

    # Landmark diagonal + gradient.
    segl = functools.partial(jax.ops.segment_sum, num_segments=L)
    Hll = segl(w * jnp.sum(Jd * Jd, axis=1), obs.lm_idx)  # (L,)
    bl = segl(jnp.sum(Jd * wr, axis=1), obs.lm_idx)  # (L,)

    # Pose-landmark blocks: W[p, l] (6,) for both roles.
    idx_al = obs.anchor_idx * L + obs.lm_idx
    idx_ol = obs.obs_idx * L + obs.lm_idx
    segpl = functools.partial(jax.ops.segment_sum, num_segments=P * L)
    JaTJd = jnp.einsum("mki,mk->mi", Ja * w[:, None, None], Jd, precision=jax.lax.Precision.HIGHEST)  # (M, 6)
    JoTJd = jnp.einsum("mki,mk->mi", Jo * w[:, None, None], Jd, precision=jax.lax.Precision.HIGHEST)
    W = (segpl(JaTJd, idx_al) + segpl(JoTJd, idx_ol)).reshape(P, L, 6)

    cost = 0.5 * jnp.sum(w * jnp.sum(r * r, axis=1))
    return Hpp, bp, Hll, bl, W, cost


def _solve_reduced(Hpp, bp, Hll, bl, W, damping, n_fixed, lm_valid):
    """Schur reduction + dense solve + landmark back-substitution."""
    P = bp.shape[0]
    L = bl.shape[0]

    Hll_safe = jnp.where((Hll > 1e-12) & lm_valid, Hll + damping, 1.0)
    inv_Hll = jnp.where((Hll > 1e-12) & lm_valid, 1.0 / Hll_safe, 0.0)

    # S = Hpp - sum_l W[:, l] inv_Hll[l] W[:, l]^T
    S = Hpp - jnp.einsum("pli,l,qlj->pqij", W, inv_Hll, W, precision=jax.lax.Precision.HIGHEST)
    rhs = bp - jnp.einsum("pli,l,l->pi", W, inv_Hll, bl, precision=jax.lax.Precision.HIGHEST)

    Sm = S.transpose(0, 2, 1, 3).reshape(6 * P, 6 * P)
    rv = rhs.reshape(6 * P)

    # Gauge: freeze the first n_fixed poses (identity rows).
    free = (jnp.arange(6 * P) >= 6 * n_fixed)
    Sm = jnp.where(free[:, None] & free[None, :], Sm, 0.0)
    Sm = Sm + jnp.diag(jnp.where(free, damping, 1.0))
    rv = jnp.where(free, rv, 0.0)

    dx_p = -jnp.linalg.solve(Sm, rv).reshape(P, 6)

    # Back-substitute landmarks: dx_l = -inv_Hll (bl + W^T dx_p).
    Wdx = jnp.einsum("pli,pi->l", W, dx_p, precision=jax.lax.Precision.HIGHEST)
    dx_l = -inv_Hll * (bl + Wdx)
    return dx_p, dx_l


def gn_solve(params: BAParams, problem: BAProblem, n_fixed: int,
             lm_valid, assemble):
    """The damped Gauss-Newton driver shared by the single-device and
    observation-sharded solves (ONE definition — the two paths used to
    carry line-for-line copies of the prior/update/clip logic, which a
    semantics fix then had to hit twice).

    assemble(q, t, lm) -> (Hpp, bp, Hll, bl, W, cost); the caller bakes
    in K/Kinv/obs/sqrtW and any psum. Returns (q', t', lm', final_cost).
    """
    P = problem.q.shape[0]
    prior_q = problem.prior_q if problem.prior_q is not None else problem.q
    prior_t = problem.prior_t if problem.prior_t is not None else problem.t

    def body(_, state):
        q, t, lm = state
        Hpp, bp, Hll, bl, W, _ = assemble(q, t, lm)
        if params.pose_prior_weight > 0:
            # Prior residual e = log(T_curr * T_prior^-1) with identity
            # Jacobian under the left perturbation.
            e = jax.vmap(lambda qq, tt, pq, pt: se3.log(
                se3.mul((qq, tt), se3.inverse((pq, pt)))))(
                    q, t, prior_q, prior_t)
            w = params.pose_prior_weight
            bp = bp + w * e
            Hpp = Hpp + w * jnp.eye(6)[None, None] * \
                jnp.eye(P)[:, :, None, None]
        dx_p, dx_l = _solve_reduced(Hpp, bp, Hll, bl, W, params.damping,
                                    n_fixed, lm_valid)
        qn, tn = jax.vmap(lambda xi, qq, tt: se3.mul(se3.exp(xi), (qq, tt)))(
            dx_p, q, t)
        lmn = jnp.clip(lm + dx_l, 1e-4, 1e3)
        lmn = jnp.where(lm_valid, lmn, lm)
        return qn, tn, lmn

    q, t, lm = jax.lax.fori_loop(0, params.n_gn_iters, body,
                                 (problem.q, problem.t, problem.lm_idepth))
    *_, cost = assemble(q, t, lm)
    return q, t, lm, cost


@functools.partial(jax.jit, static_argnames=("params", "n_fixed"))
def solve_window(params: BAParams, K, Kinv, problem: BAProblem,
                 n_fixed: int = 2, sqrtW=None):
    """Run n_gn_iters damped Gauss-Newton iterations on the window.

    sqrtW: optional (M, 2, 2) residual whitening (structure-tensor
    weights; ba/rematch.observation_weights). Returns
    (q', t', lm_idepth', final_cost).
    """
    P = problem.q.shape[0]
    L = problem.lm_idepth.shape[0]

    def assemble(q, t, lm):
        return _assemble(K, Kinv, q, t, lm, problem.obs,
                         params.huber_delta, P, L, sqrtW=sqrtW)

    return gn_solve(params, problem, n_fixed, problem.lm_valid, assemble)


def window_cost(params: BAParams, K, Kinv, problem: BAProblem) -> jax.Array:
    P = problem.q.shape[0]
    L = problem.lm_idepth.shape[0]
    *_, cost = _assemble(K, Kinv, problem.q, problem.t, problem.lm_idepth,
                         problem.obs, params.huber_delta, P, L)
    return cost
