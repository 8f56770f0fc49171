"""Loop closing: BoW detection, consistency chains, Sim3, loop correction.

Host-side orchestrator mirroring the reference's LoopClosing thread
(/root/reference/src/LoopClosing.cc) over the SoA map:

- DetectLoop (:103): BoW query gated by the min covisible score, candidate
  covisibility-consistency chained over 3 consecutive keyframes (:43,
  152-211);
- ComputeSim3 (:231): descriptor matching between the two keyframes' map
  points, vmapped Horn Sim3 RANSAC (Sim3Solver), scale fixed for
  stereo/RGB-D;
- CorrectLoop (:402): Sim3 correction propagated to the current KF's
  covisible neighborhood and their points, essential-graph optimization
  over spanning + strong-covisibility + loop edges (Optimizer.cc:781),
  point correction through reference keyframes, then full BA (the
  reference's asynchronous GBA, run synchronously here).

The vocabulary is trained lazily from the map's own descriptors once
enough keyframes exist (the reference loads a pre-trained vocabulary that
is unavailable and pattern-incompatible — SURVEY.md preamble).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.geometry.camera import project
from tpuslam.geometry.se3 import se3_apply, se3_compose, se3_inverse
from tpuslam.geometry.sim3 import sim3_apply, sim3_compose, sim3_inverse
from tpuslam.mapstate.core import MapState, covisibility_weights
from tpuslam.matching.search import (
    TH_HIGH,
    TH_LOW,
    match_nn_ratio,
    search_by_projection_points,
)
from tpuslam.optim.pose_graph import Sim3Edges, make_relative, optimize_pose_graph
from tpuslam.place.database import KeyFrameDatabase, l1_score
from tpuslam.place.vocabulary import Vocabulary, bow_vector, train_vocabulary
from tpuslam.sfm.sim3solver import sim3_ransac

COVIS_CONSISTENCY_TH = 3   # LoopClosing.cc:43
MIN_KF_GAP = 10            # :114 — at least 10 KFs since last loop
STRONG_COVIS = 100         # essential-graph covisibility threshold (:806)


class LoopCloser:
    def __init__(
        self,
        max_keyframes: int,
        fix_scale: bool,
        voc: Optional[Vocabulary] = None,
        voc_k: int = 8,
        voc_levels: int = 3,
        min_sim3_inliers: int = 20,
        min_total_matches: int = 40,
    ):
        self.voc = voc
        self.voc_k = voc_k
        self.voc_levels = voc_levels
        self.db: Optional[KeyFrameDatabase] = None
        self.max_keyframes = max_keyframes
        self.fix_scale = fix_scale
        self.min_sim3_inliers = min_sim3_inliers
        self.min_total_matches = min_total_matches
        self._tried_default = False
        self._bow = {}
        self._consistent_groups = []  # list[(set(kf_ids), count)]
        self._last_loop_kf = -1
        self._key = jax.random.PRNGKey(42)
        self.n_loops_closed = 0

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _ensure_vocabulary(self, m: MapState):
        if self.voc is not None:
            return True
        # Shipped default vocabulary (the reference loads ORBvoc.txt at
        # startup, System.cc:73; ours is trained by
        # tools/build_default_vocab.py and replaceable via the voc arg).
        if not self._tried_default:
            self._tried_default = True
            import os

            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "data",
                "default_vocab.npz",
            )
            if os.path.exists(path):
                self.voc = Vocabulary.load(path)
                return True
        # Else train once enough descriptors are in the map (>= 3 KFs).
        n_kf = int(m.n_kf)
        if n_kf < 3:
            return False
        descs = []
        for k in range(n_kf):
            v = np.asarray(m.kf_kp_valid[k])
            descs.append(np.asarray(m.kf_kp_desc[k])[v])
        corpus = np.concatenate(descs, axis=0)
        if len(corpus) < 500:
            return False
        self.voc = train_vocabulary(
            corpus[:6000], k=self.voc_k, levels=self.voc_levels, seed=7
        )
        return True

    def _kf_bow(self, m: MapState, k: int):
        if k not in self._bow:
            self._bow[k] = bow_vector(self.voc, m.kf_kp_desc[k], m.kf_kp_valid[k])
        return self._bow[k]

    # -------------------------------------------------------------- detection

    def _detect(self, m: MapState, kf: int, covis: jnp.ndarray):
        """Returns a loop-candidate KF index or None."""
        if self.db is None:
            self.db = KeyFrameDatabase(self.voc.n_words, self.max_keyframes)
        v = self._kf_bow(m, kf)

        if kf - max(self._last_loop_kf, 0) < MIN_KF_GAP or kf < MIN_KF_GAP:
            self.db.add(kf, v)
            self._consistent_groups = []
            return None

        covis_np = np.asarray(covis[kf])
        neighbors = np.nonzero(covis_np >= 15)[0]
        # minScore: lowest BoW similarity among covisible KFs (:124-138).
        min_score = 1.0
        for nb in neighbors:
            if nb in self._bow:
                min_score = min(min_score, float(l1_score(v, self._bow[nb])))

        exclude = np.zeros(self.max_keyframes, bool)
        exclude[kf] = True
        exclude[neighbors] = True
        # Also exclude recent KFs (temporal neighbors).
        exclude[max(0, kf - MIN_KF_GAP) : kf + 1] = True
        idx, ok = self.db.query(
            v, jnp.asarray(exclude), covis, min_score=min_score, max_candidates=6
        )
        idx = np.asarray(idx)
        ok = np.asarray(ok)
        cands = [int(i) for i, o in zip(idx, ok) if o]

        self.db.add(kf, v)
        if not cands:
            self._consistent_groups = []
            return None

        # Covisibility-consistency chaining (:152-211).
        new_groups = []
        enough = None
        for c in cands:
            group = {c} | set(np.nonzero(np.asarray(covis[c]) >= 15)[0].tolist())
            count = 0
            for prev_group, prev_count in self._consistent_groups:
                if group & prev_group:
                    count = max(count, prev_count + 1)
            new_groups.append((group, count))
            if count >= COVIS_CONSISTENCY_TH - 1 and enough is None:
                enough = c
        self._consistent_groups = new_groups
        return enough

    # ------------------------------------------------------------------ sim3

    def _kf_cam_points(self, m: MapState, kf: int):
        """Per-keypoint-slot camera-frame positions of the KF's map points and
        the slot mask. Returns (X (N, 3), has (N,))."""
        obs = m.kf_obs_pt[kf]
        has = (obs >= 0) & m.kf_kp_valid[kf] & m.pt_valid[jnp.maximum(obs, 0)]
        X = se3_apply(m.kf_R[kf], m.kf_t[kf], m.pt_xyz[jnp.maximum(obs, 0)])
        return X, has

    def _search_by_sim3(self, m: MapState, cam, kf_cur: int, kf_loop: int,
                        s21, R21, t21):
        """ORBmatcher::SearchBySim3 (/root/reference/src/ORBmatcher.cc:1170):
        mutually-consistent Sim3-guided projection matching between the two
        keyframes' map points. Returns (idx_f (N,), mutual (N,)): per loop-KF
        slot, the matched current-KF keypoint and the mutual-agreement mask."""
        N = m.kf_obs_pt.shape[1]
        X_c, has_c = self._kf_cam_points(m, kf_cur)
        X_l, has_l = self._kf_cam_points(m, kf_loop)

        # Forward: loop points into the current camera.
        X_l_in_c = sim3_apply(s21, R21, t21, X_l)
        lvl_l = m.kf_kp_level[kf_loop]
        idx_f, _, ok_f = search_by_projection_points(
            project(cam, X_l_in_c),
            m.kf_kp_desc[kf_loop],
            has_l & (X_l_in_c[:, 2] > 0),
            7.5 * 1.2 ** lvl_l.astype(jnp.float32),
            jnp.maximum(lvl_l - 1, 0),
            lvl_l + 1,
            m.kf_kp_xy[kf_cur],
            m.kf_kp_desc[kf_cur],
            m.kf_kp_level[kf_cur],
            m.kf_kp_angle[kf_cur],
            m.kf_kp_valid[kf_cur],
            max_dist=TH_HIGH,
        )
        # Backward: current points into the loop camera.
        si, Ri, ti = sim3_inverse(s21, R21, t21)
        X_c_in_l = sim3_apply(si, Ri, ti, X_c)
        lvl_c = m.kf_kp_level[kf_cur]
        idx_b, _, ok_b = search_by_projection_points(
            project(cam, X_c_in_l),
            m.kf_kp_desc[kf_cur],
            has_c & (X_c_in_l[:, 2] > 0),
            7.5 * 1.2 ** lvl_c.astype(jnp.float32),
            jnp.maximum(lvl_c - 1, 0),
            lvl_c + 1,
            m.kf_kp_xy[kf_loop],
            m.kf_kp_desc[kf_loop],
            m.kf_kp_level[kf_loop],
            m.kf_kp_angle[kf_loop],
            m.kf_kp_valid[kf_loop],
            max_dist=TH_HIGH,
        )
        # Mutual agreement (ORBmatcher.cc:1330-1345): loop slot i matched to
        # current keypoint j counts only if current slot j matches back to i.
        j = idx_f
        mutual = ok_f & ok_b[j] & (idx_b[j] == jnp.arange(N))
        return idx_f, mutual

    def _neighborhood_matches(self, m: MapState, cam, kf_cur: int, kf_loop: int,
                              s21, R21, t21, covis: jnp.ndarray):
        """Project the loop KF's covisible neighborhood's map points into the
        current frame through the corrected S_cw and match
        (LoopClosing::ComputeSim3 final gate, LoopClosing.cc:352-391;
        projection per ORBmatcher.cc:290 with th=10). Returns the per-current-
        keypoint matched mask."""
        P = m.capacity_pt
        nbrs = np.nonzero(np.asarray(covis[kf_loop]) >= 15)[0].tolist()
        nbrs = [k for k in ([kf_loop] + nbrs) if k < int(m.n_kf)]
        obs = m.kf_obs_pt[jnp.asarray(np.array(nbrs, np.int32))]       # (B, N)
        hasv = (obs >= 0) & m.kf_kp_valid[jnp.asarray(np.array(nbrs, np.int32))]
        flat = jnp.where(hasv, obs, P).reshape(-1)
        nb_mask = jnp.zeros((P + 1,), bool).at[flat].set(True)[:P] & m.pt_valid

        # Corrected S_cw = S21 * T_loop,w; camera center = S_cw^-1(0).
        s_cw, R_cw, t_cw = sim3_compose(
            s21, R21, t21, jnp.ones(()), m.kf_R[kf_loop], m.kf_t[kf_loop]
        )
        Xc = sim3_apply(s_cw, R_cw, t_cw, m.pt_xyz)
        uv = project(cam, Xc)
        center = sim3_inverse(s_cw, R_cw, t_cw)[2]  # S_cw^-1 at the origin
        # Predicted octave from the scale-invariance range
        # (MapPoint::PredictScale, /root/reference/src/MapPoint.cc:385).
        dist = jnp.linalg.norm(m.pt_xyz - center[None], axis=-1)
        finite = jnp.isfinite(m.pt_max_dist) & (m.pt_max_dist > 0)
        ratio = jnp.where(finite, m.pt_max_dist / jnp.maximum(dist, 1e-9), 1.0)
        pred = jnp.clip(
            jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(1.2)), 0, 7
        ).astype(jnp.int32)
        in_img = (
            (Xc[:, 2] > 0)
            & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
            & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
        )
        lo = jnp.where(finite, jnp.maximum(pred - 1, 0), 0)
        hi = jnp.where(finite, pred + 1, 7)
        idx, _, ok = search_by_projection_points(
            uv,
            m.pt_desc,
            nb_mask & in_img,
            10.0 * 1.2 ** pred.astype(jnp.float32),
            lo,
            hi,
            m.kf_kp_xy[kf_cur],
            m.kf_kp_desc[kf_cur],
            m.kf_kp_level[kf_cur],
            m.kf_kp_angle[kf_cur],
            m.kf_kp_valid[kf_cur],
            max_dist=TH_LOW,
        )
        N = m.kf_obs_pt.shape[1]
        return jnp.zeros((N + 1,), bool).at[jnp.where(ok, idx, N)].set(True)[:N]

    def _compute_sim3(self, m: MapState, cam, kf_cur: int, kf_loop: int,
                      covis: jnp.ndarray):
        """Descriptor-match the two KFs' map points, run Sim3 RANSAC, widen
        with mutually-consistent Sim3-guided projection (SearchBySim3),
        refine (OptimizeSim3), then gate on total matches against the loop
        neighborhood's projected points (LoopClosing::ComputeSim3,
        /root/reference/src/LoopClosing.cc:231-391). Returns (s, R, t)
        mapping loop-KF camera coords -> current-KF camera coords, or None."""
        N = m.kf_obs_pt.shape[1]
        obs_c = m.kf_obs_pt[kf_cur]
        obs_l = m.kf_obs_pt[kf_loop]
        has_c = (obs_c >= 0) & m.kf_kp_valid[kf_cur] & m.pt_valid[jnp.maximum(obs_c, 0)]
        has_l = (obs_l >= 0) & m.kf_kp_valid[kf_loop] & m.pt_valid[jnp.maximum(obs_l, 0)]
        pair = has_c[:, None] & has_l[None, :]
        idx, dist, ok = match_nn_ratio(
            m.kf_kp_desc[kf_cur], m.kf_kp_desc[kf_loop], pair, max_dist=50, nn_ratio=0.75
        )
        if int(jnp.sum(ok)) < self.min_sim3_inliers:
            return None

        def match_arrays(idx, ok):
            """Per-current-slot match arrays against loop slots idx."""
            Xw_c = m.pt_xyz[jnp.maximum(obs_c, 0)]
            Xw_l = m.pt_xyz[jnp.maximum(obs_l[idx], 0)]
            X2 = se3_apply(m.kf_R[kf_cur], m.kf_t[kf_cur], Xw_c)    # current
            X1 = se3_apply(m.kf_R[kf_loop], m.kf_t[kf_loop], Xw_l)  # loop
            uv2 = m.kf_kp_xy[kf_cur]
            uv1 = m.kf_kp_xy[kf_loop][idx]
            lvl2 = m.kf_kp_level[kf_cur]
            lvl1 = m.kf_kp_level[kf_loop][idx]
            sigma2_2 = 1.2 ** (2.0 * lvl2.astype(jnp.float32))
            sigma2_1 = 1.2 ** (2.0 * lvl1.astype(jnp.float32))
            return X1, X2, uv1, uv2, sigma2_1, sigma2_2

        X1, X2, uv1, uv2, sigma2_1, sigma2_2 = match_arrays(idx, ok)
        res = sim3_ransac(
            self._next_key(),
            cam.K,
            X1,
            X2,
            uv1,
            uv2,
            9.21 * sigma2_1,
            9.21 * sigma2_2,
            ok,
            fix_scale=self.fix_scale,
            min_inliers=self.min_sim3_inliers,
        )
        if not bool(res.success):
            return None

        # Widen with mutually-consistent guided projection (SearchBySim3,
        # LoopClosing.cc:317-323) before the refinement.
        idx_f, mutual = self._search_by_sim3(
            m, cam, kf_cur, kf_loop, res.s, res.R, res.t
        )
        tgt = jnp.where(mutual, idx_f, N)  # mutual => idx_f injective
        add = jnp.full((N + 1,), -1, jnp.int32).at[tgt].set(
            jnp.arange(N, dtype=jnp.int32)
        )[:N]
        merged_idx = jnp.where(ok, idx, jnp.maximum(add, 0))
        merged_ok = ok | ((add >= 0) & has_c)

        # GN refinement over reprojection residuals (Optimizer::OptimizeSim3).
        # The reference shields this step from wrong matches with Huber
        # kernels; the batched GN instead gates the merged set by the RANSAC
        # estimate's mutual chi2 check before refining.
        from tpuslam.sfm.sim3solver import optimize_sim3, sim3_chi2_inliers

        X1, X2, uv1, uv2, sigma2_1, sigma2_2 = match_arrays(merged_idx, merged_ok)
        merged_ok = sim3_chi2_inliers(
            cam.K, res.s, res.R, res.t, X1, X2, uv1, uv2,
            9.21 * sigma2_1, 9.21 * sigma2_2, merged_ok,
        )
        s, R, t, inl, n_inl = optimize_sim3(
            cam.K, res.s, res.R, res.t, X1, X2, uv1, uv2,
            1.0 / sigma2_1, 1.0 / sigma2_2, merged_ok,
            fix_scale=self.fix_scale,
        )
        if int(n_inl) < self.min_sim3_inliers:
            return None

        # Accept only if enough of the loop neighborhood's points re-find
        # themselves in the current frame (>= 40 total, LoopClosing.cc:389).
        nb_hit = self._neighborhood_matches(
            m, cam, kf_cur, kf_loop, s, R, t, covis
        )
        total = int(jnp.sum(nb_hit | (merged_ok & inl)))
        if total < self.min_total_matches:
            return None
        return s, R, t

    # ------------------------------------------------------------ correction

    def _correct(self, m: MapState, cam, kf_cur: int, kf_loop: int, s21, R21, t21,
                 covis: jnp.ndarray, ba_fn=None):
        """CorrectLoop (:402) + OptimizeEssentialGraph + point correction."""
        K = m.capacity_kf
        n_kf = int(m.n_kf)
        ones = jnp.ones(())

        # Current KF's corrected pose: S_cw = S21 * T_loop,w.
        s_corr, R_corr, t_corr = sim3_compose(
            s21, R21, t21, jnp.asarray(1.0), m.kf_R[kf_loop], m.kf_t[kf_loop]
        )

        # Old poses as Sim3 (s=1).
        s_old = jnp.ones((K,))
        R_old = m.kf_R
        t_old = m.kf_t

        # Propagate the correction to the current KF's covisible group
        # (:447-516): S_kw_corr = (T_k T_cur^-1) * S_cw_corr.
        group = set(np.nonzero(np.asarray(covis[kf_cur]) >= 15)[0].tolist()) | {kf_cur}
        group = {g for g in group if g < n_kf}
        s_init = s_old
        R_init = R_old
        t_init = t_old
        Tc_inv = se3_inverse(m.kf_R[kf_cur], m.kf_t[kf_cur])
        for g in sorted(group):
            Rrel, trel = se3_compose(m.kf_R[g], m.kf_t[g], *Tc_inv)
            sg, Rg, tg = sim3_compose(
                jnp.asarray(1.0), Rrel, trel, s_corr, R_corr, t_corr
            )
            s_init = s_init.at[g].set(sg)
            R_init = R_init.at[g].set(Rg)
            t_init = t_init.at[g].set(tg)

        # Essential-graph edges from PRE-correction poses: spanning tree
        # (sequential parent), strong covisibility, plus the loop edge with
        # the measured constraint.
        ei, ej, ms, mR, mt, wgt = [], [], [], [], [], []
        covis_np = np.asarray(covis)
        # Temporal chain over VALID keyframes in FRAME-ID order (slot order
        # stops tracking time once culled slots are recycled); culled KFs
        # are not graph vertices — their exported poses resolve through
        # their spanning-tree parents, which ARE corrected here.
        valid_np = np.asarray(m.kf_valid)
        fid_np = np.asarray(m.kf_frame_id)
        order = sorted(np.nonzero(valid_np)[0].tolist(), key=lambda k: int(fid_np[k]))
        pos = {k: i for i, k in enumerate(order)}
        for a, b in zip(order[:-1], order[1:]):
            ei.append(a)
            ej.append(b)
            sr, Rr, tr = make_relative(
                s_old[a], R_old[a], t_old[a], s_old[b], R_old[b], t_old[b]
            )
            ms.append(sr)
            mR.append(Rr)
            mt.append(tr)
            wgt.append(1.0)
        for a in order:
            for b in order:
                if pos[b] < pos[a] + 2:
                    continue  # chain-adjacent (or earlier) pairs
                if covis_np[a, b] >= STRONG_COVIS:
                    ei.append(a)
                    ej.append(b)
                    sr, Rr, tr = make_relative(
                        s_old[a], R_old[a], t_old[a], s_old[b], R_old[b], t_old[b]
                    )
                    ms.append(sr)
                    mR.append(Rr)
                    mt.append(tr)
                    wgt.append(1.0)
        # Loop edge: measured S_cur,loop (current = S21 * loop).
        ei.append(kf_loop)
        ej.append(kf_cur)
        ms.append(s21)
        mR.append(R21)
        mt.append(t21)
        wgt.append(1.0)

        edges = Sim3Edges(
            i=jnp.asarray(np.array(ei, np.int32)),
            j=jnp.asarray(np.array(ej, np.int32)),
            meas_s=jnp.stack([jnp.asarray(x) for x in ms]),
            meas_R=jnp.stack(mR),
            meas_t=jnp.stack(mt),
            valid=jnp.ones(len(ei), bool),
            weight=jnp.asarray(np.array(wgt, np.float32)),
        )
        node_valid = m.kf_valid
        node_fixed = jnp.zeros((K,), bool).at[kf_loop].set(True)
        s_new, R_new, t_new, errs = optimize_pose_graph(
            s_init, R_init, t_init, node_valid, node_fixed, edges,
            iters=15, fix_scale=self.fix_scale,
        )

        # Point correction through each point's reference KF (:989-1043):
        # X' = S_new_ref^-1 ( S_old_ref (X) ).
        ref = jnp.clip(m.pt_ref_kf, 0, K - 1)
        so, Ro, to = s_old[ref], R_old[ref], t_old[ref]
        Xc = sim3_apply(so, Ro, to, m.pt_xyz)
        sni, Rni, tni = sim3_inverse(s_new[ref], R_new[ref], t_new[ref])
        X_corr = sim3_apply(sni, Rni, tni, Xc)
        pt_xyz = jnp.where(m.pt_valid[:, None], X_corr, m.pt_xyz)

        # SE3 recovery: R stays, t divided by s (Optimizer.cc:1000-1015).
        t_se3 = t_new / jnp.maximum(s_new, 1e-9)[:, None]
        m = m._replace(kf_R=R_new, kf_t=t_se3, pt_xyz=pt_xyz)

        # Full BA (the reference's post-loop global BA, :645).
        if ba_fn is not None:
            m = ba_fn(m)
        self._last_loop_kf = kf_cur
        self.n_loops_closed += 1
        return m

    # --------------------------------------------------------------- public

    def on_keyframe(self, m: MapState, cam, kf_cur: int, ba_fn=None):
        """Run detection + closure for a newly inserted keyframe.
        Returns (map, closed: bool)."""
        if not self._ensure_vocabulary(m):
            return m, False
        covis = covisibility_weights(m)
        cand = self._detect(m, kf_cur, covis)
        if cand is None:
            return m, False
        sim3 = self._compute_sim3(m, cam, kf_cur, cand, covis)
        if sim3 is None:
            return m, False
        s21, R21, t21 = sim3
        m = self._correct(m, cam, kf_cur, cand, s21, R21, t21, covis, ba_fn=ba_fn)
        return m, True
