"""Windowed BA bookkeeping and Flame integration.

Collects per-poseframe feature observations from the tracking step
(pipeline.TrackObs), maintains a bounded observation store keyed by
globally-unique feature ids and frame ids (feature SLOTS are recycled;
keying on slots would fuse observations of different physical points into
one landmark and blow up the solve), assembles fixed-shape BAProblem
windows, and applies refined poses/idepths back into the pipeline through
the same contract the reference exposes to an external estimator
(updatePoseFramePoses + feature idepth rewrite; flame.h:155-174).
"""

from collections import deque
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from flame_tpu.ba import residuals as resid
from flame_tpu.ba import schur
from flame_tpu.params import BAParams


class ObservationStore:
    """Bounded store of (anchor_id, obs_frame_id, feat_id, u_ref, u_obs)."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self._rows: deque = deque(maxlen=capacity)

    def add_frame(self, anchor_ids, obs_frame_id: int, feat_ids,
                  u_ref, u_obs) -> None:
        for k in range(len(feat_ids)):
            self._rows.append((int(anchor_ids[k]), int(obs_frame_id),
                               int(feat_ids[k]),
                               u_ref[k].copy(), u_obs[k].copy()))

    def drop_frames(self, dead_ids) -> None:
        dead = set(int(i) for i in dead_ids)
        self._rows = deque(
            (r for r in self._rows
             if r[0] not in dead and r[1] not in dead),
            maxlen=self.capacity)

    def __len__(self):
        return len(self._rows)

    def build_window(self, frame_ids: List[int],
                     pose_by_id: Dict[int, Tuple[np.ndarray, np.ndarray]],
                     lm_init: Dict[Tuple[int, int], float],
                     max_landmarks: int, max_obs: int):
        """Assemble a BAProblem over the given keyframe window.

        lm_init maps landmark key (feat_id, anchor_id) -> current inverse
        depth; keys absent from lm_init are skipped (the feature died or
        re-anchored). Returns (problem, pose_order, landmark_keys) or None.
        """
        idset = {fid: i for i, fid in enumerate(frame_ids)}
        lm_key_to_idx: Dict[Tuple[int, int], int] = {}
        rows = []
        for (aid, oid, feat_id, u_ref, u_obs) in self._rows:
            if aid not in idset or oid not in idset or aid == oid:
                continue
            key = (feat_id, aid)
            if key not in lm_init:
                continue
            if key not in lm_key_to_idx:
                if len(lm_key_to_idx) >= max_landmarks:
                    continue
                lm_key_to_idx[key] = len(lm_key_to_idx)
            rows.append((idset[aid], idset[oid], lm_key_to_idx[key],
                         u_ref, u_obs))
            if len(rows) >= max_obs:
                break

        if len(rows) < 12 or len(lm_key_to_idx) < 4:
            return None

        L = len(lm_key_to_idx)
        lm_idepth = np.zeros(L, np.float32)
        for key, li in lm_key_to_idx.items():
            lm_idepth[li] = lm_init[key]

        M = len(rows)
        a = np.array([r[0] for r in rows], np.int32)
        o = np.array([r[1] for r in rows], np.int32)
        l = np.array([r[2] for r in rows], np.int32)
        ur = np.stack([r[3] for r in rows]).astype(np.float32)
        uo = np.stack([r[4] for r in rows]).astype(np.float32)

        # Pad to fixed shapes for jit stability.
        Mp = max_obs
        pad = Mp - M
        obs = resid.BAObservations(
            anchor_idx=jnp.asarray(np.pad(a, (0, pad))),
            obs_idx=jnp.asarray(np.pad(o, (0, pad))),
            lm_idx=jnp.asarray(np.pad(l, (0, pad))),
            u_ref=jnp.asarray(np.pad(ur, ((0, pad), (0, 0)))),
            u_obs=jnp.asarray(np.pad(uo, ((0, pad), (0, 0)))),
            valid=jnp.asarray(np.arange(Mp) < M))

        Lp = max_landmarks
        lm_pad = np.zeros(Lp, np.float32)
        lm_pad[:L] = lm_idepth
        lm_valid = np.arange(Lp) < L

        q = np.stack([pose_by_id[f][0] for f in frame_ids]).astype(np.float32)
        t = np.stack([pose_by_id[f][1] for f in frame_ids]).astype(np.float32)

        problem = schur.BAProblem(
            q=jnp.asarray(q), t=jnp.asarray(t),
            lm_idepth=jnp.asarray(lm_pad),
            lm_valid=jnp.asarray(lm_valid), obs=obs)
        keys = [None] * L
        for key, li in lm_key_to_idx.items():
            keys[li] = key
        return problem, list(frame_ids), keys, M


class BundleAdjuster:
    """Drives windowed BA over a Flame instance."""

    # A solve whose final mean weighted residual^2 exceeds this (px^2) is
    # considered diverged/contaminated: nothing is written back.
    MAX_MEAN_COST = 9.0

    def __init__(self, params: BAParams, K, Kinv):
        self.params = params
        self.K = K
        self.Kinv = Kinv
        self.store = ObservationStore(params.obs_capacity)
        self.last_cost: Optional[float] = None
        self.last_accepted: bool = False

    def ingest(self, fl, obs, obs_frame_id: int) -> None:
        """Record this update's successful matches when the observed frame
        is a poseframe. obs: pipeline.TrackObs."""
        success = np.asarray(obs.success)
        if not success.any():
            return
        slots = np.nonzero(success)[0]
        pf_slots = np.asarray(fl._feats.pf_slot)[slots]
        feat_ids = np.asarray(fl._feats.feat_id)[slots]
        stack_ids = np.asarray(fl._stack.frame_id)
        anchor_ids = stack_ids[pf_slots]
        keep = anchor_ids != obs_frame_id
        slots = slots[keep]
        if slots.shape[0] == 0:
            return
        self.store.add_frame(anchor_ids[keep], obs_frame_id, feat_ids[keep],
                             np.asarray(obs.u_ref)[slots],
                             np.asarray(obs.u_obs)[slots])

    def _current_landmarks(self, fl):
        """Map (feat_id, anchor_id) -> (slot, idepth) for live features."""
        valid = fl._feat_valid_np
        feat_ids = np.asarray(fl._feats.feat_id)
        pf_slots = np.asarray(fl._feats.pf_slot)
        mu = np.asarray(fl._feats.idepth_mu)
        stack_ids = np.asarray(fl._stack.frame_id)
        out = {}
        for s in np.nonzero(valid)[0]:
            if mu[s] > 1e-6:
                out[(int(feat_ids[s]), int(stack_ids[pf_slots[s]]))] = \
                    (int(s), float(mu[s]))
        return out

    def solve(self, fl, window_ids: Optional[List[int]] = None,
              n_fixed: int = 2) -> bool:
        """Solve over the newest window_size poseframes and write results
        back into the pipeline. Returns True if a solve ran and was
        accepted."""
        p = self.params
        live = sorted(fl._pf_slot_by_id.keys())
        if window_ids is None:
            window_ids = live[-p.window_size:]
        if len(window_ids) < max(n_fixed + 1, 3):
            return False

        pose_by_id = {}
        for fid in window_ids:
            slot = fl._pf_slot_by_id[fid]
            pose_by_id[fid] = (np.asarray(fl._stack.q[slot]),
                               np.asarray(fl._stack.t[slot]))
        lm_map = self._current_landmarks(fl)
        lm_init = {k: v[1] for k, v in lm_map.items()}

        built = self.store.build_window(window_ids, pose_by_id, lm_init,
                                        max_landmarks=1024, max_obs=4096)
        if built is None:
            return False
        problem, order, keys, n_obs = built

        sqrtW = None
        slot_w = jnp.asarray(
            [fl._pf_slot_by_id[f] for f in order], jnp.int32)
        obs = problem.obs
        if p.do_rematch:
            # Restore the perpendicular residual component the epipolar
            # front-end removed (ba/rematch.py).
            from flame_tpu.ba import rematch
            u_obs2, _ = rematch.rematch_observations(
                self.K, self.Kinv, fl._stack.img_pad, fl.params.pad,
                problem.q, problem.t, obs.anchor_idx, obs.obs_idx,
                slot_w[obs.anchor_idx], slot_w[obs.obs_idx],
                obs.u_ref, obs.u_obs, obs.lm_idx, problem.lm_idepth,
                obs.valid, radius=p.rematch_radius,
                max_cost=p.rematch_max_cost, min_eig=p.rematch_min_eig)
            problem = problem._replace(obs=obs._replace(u_obs=u_obs2))
        if p.aniso_weights:
            # Whiten residuals by each anchor patch's structure tensor:
            # an intensity match constrains the reprojection along the
            # local gradient only; differently-oriented edge features
            # then combine into full pose constraints instead of their
            # unconstrained along-edge components polluting the solve.
            from flame_tpu.ba import rematch
            sqrtW = rematch.observation_weights(
                fl._stack.img_pad, fl.params.pad, slot_w[obs.anchor_idx],
                obs.u_ref)

        q, t, lm, cost = schur.solve_window(p, self.K, self.Kinv, problem,
                                            n_fixed=n_fixed, sqrtW=sqrtW)
        self.last_cost = float(cost)
        mean_cost = self.last_cost / max(n_obs, 1)
        self.last_accepted = np.isfinite(mean_cost) and \
            mean_cost < self.MAX_MEAN_COST
        if not self.last_accepted:
            return False

        # Write back poses (the updatePoseFramePoses contract).
        fl.update_poseframe_poses(
            {fid: (np.asarray(q)[i], np.asarray(t)[i])
             for i, fid in enumerate(order)})

        # Write back refined idepths for landmarks whose feature still has
        # the same identity and anchor.
        mu = np.asarray(fl._feats.idepth_mu).copy()
        lm_np = np.asarray(lm)
        for li, key in enumerate(keys):
            hit = lm_map.get(key)
            if hit is not None:
                mu[hit[0]] = lm_np[li]
        fl._feats = fl._feats._replace(idepth_mu=jnp.asarray(mu))
        return True
