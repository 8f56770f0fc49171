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
    rotation_consistency_mask,
    search_by_projection_points,
)
from tpuslam.optim.pose_graph import Sim3Edges, make_relative, optimize_pose_graph
from tpuslam.place.database import (
    SparseBow,
    SparseKeyFrameDatabase,
    l1_score_sparse,
)
from tpuslam.place.vocabulary import (
    Vocabulary,
    sparse_bow_vector,
    train_vocabulary,
)
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
        # Sparse layout (per-KF word lists) so a DBoW2-scale vocabulary
        # (k=10, L=6 ≈ 1M words) fits: O(K·L) memory, W-independent.
        self.db: Optional[SparseKeyFrameDatabase] = None
        self.max_keyframes = max_keyframes
        self.fix_scale = fix_scale
        self.min_sim3_inliers = min_sim3_inliers
        self.min_total_matches = min_total_matches
        self._tried_default = False
        self._bow = {}
        self._kp_nodes_cache = {}
        self._consistent_groups = []  # list[(set(kf_ids), count)]
        self._key = jax.random.PRNGKey(42)
        self.n_loops_closed = 0
        # Slot indices are NOT temporal order once the tracker recycles
        # culled keyframe slots: temporal gating uses an insertion sequence
        # number per slot, and per-slot caches (_bow, database rows) are
        # reconciled against kf_frame_id every call (a recycled slot's
        # frame id changes; a culled slot goes invalid).
        self._seq = 0
        self._last_loop_seq = -(10 ** 9)
        self._slot_seq = np.full(max_keyframes, -1, np.int64)
        self._slot_fid = np.full(max_keyframes, -1, np.int64)
        # Persistent loop edges by FRAME ID pairs (KeyFrame::AddLoopEdge,
        # consumed by every later essential graph, Optimizer.cc:926-950).
        self._loop_edges: list = []
        # Point-slot forwarding from the latest closure's fusion (the
        # MapPoint::Replace map); the tracker applies it to its live frame
        # references (Tracking::CheckReplacedInLastFrame analog).
        self.last_point_remap = None

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

            data_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "data",
            )
            # Preference order: explicit override, then the shipped default.
            # A reference-scale 1M-word tree (k=10, L=6 — the scale
            # System.cc:73-81 loads) is ALSO shipped
            # (data/default_vocab_1m.npz, tools/build_default_vocab.py
            # --levels 6 --scale 16), but measured recall on the held-out
            # place set is better for the 100k tree (r@1 0.988 / margin
            # 0.114 vs 0.985 / 0.063): 4.1M synthetic descriptors give the
            # 1M tree only ~4 training descriptors per leaf, where the
            # reference's artifact was trained on tens of millions of real
            # ones. Select the 1M tree via TPUSLAM_VOCAB when a matching
            # corpus is available (BASELINE.md records both evals).
            candidates = [
                os.environ.get("TPUSLAM_VOCAB"),
                os.path.join(data_dir, "default_vocab.npz"),
                os.path.join(data_dir, "default_vocab_1m.npz"),
            ]
            for path in candidates:
                if path and os.path.exists(path):
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
        import warnings

        warnings.warn(
            "tpuslam: shipped default vocabulary not found; training a "
            f"tiny in-session fallback ({self.voc_k}^{self.voc_levels} "
            "words from the first keyframes). Loop/relocalization recall "
            "will be degraded — install tpuslam/data/default_vocab.npz "
            "(tools/build_default_vocab.py) or pass voc= explicitly.",
            stacklevel=2,
        )
        self.voc = train_vocabulary(
            corpus[:6000], k=self.voc_k, levels=self.voc_levels, seed=7
        )
        return True

    def _reconcile(self, m: MapState):
        """Invalidate per-slot state for slots whose occupant changed.

        The reference erases culled keyframes from the database in
        KeyFrame::SetBadFlag; here culling AND slot recycling are detected
        in one sweep by comparing each slot's frame id (invalid slots count
        as empty) against the last-seen value."""
        fid = np.asarray(m.kf_frame_id).astype(np.int64).copy()
        fid[~np.asarray(m.kf_valid)] = -1
        changed = np.nonzero(fid != self._slot_fid)[0]
        for s in changed:
            s = int(s)
            self._bow.pop(s, None)
            self._kp_nodes_cache.pop(s, None)
            if self.db is not None:
                self.db.erase(s)
            self._slot_seq[s] = -1
        self._slot_fid = fid

    def _kf_bow(self, m: MapState, k: int) -> SparseBow:
        if k not in self._bow:
            self._bow[k] = sparse_bow_vector(
                self.voc, m.kf_kp_desc[k], m.kf_kp_valid[k]
            )
        return self._bow[k]

    def _kp_nodes(self, m: MapState, k: int) -> np.ndarray:
        """Per-keypoint vocabulary NODE ids at an intermediate tree level —
        the FeatureVector of DBoW2 (TemplatedVocabulary.h:1127-1194 with
        levelsup=4): SearchByBoW only compares descriptors under the same
        node (ORBmatcher.cc:590), which is what keeps perceptually-aliased
        descriptor pairs out of the loop Sim3 stage. Complete k-ary layout
        makes the node id a division of the leaf word id. -1 = invalid."""
        if k not in self._kp_nodes_cache:
            from tpuslam.place.vocabulary import transform_words

            voc = self.voc
            # DBoW2's levelsup=4 node level, floored so the constraint has
            # at least ~100 nodes even for shallower trees.
            lvl = voc.levels - 4
            while lvl < voc.levels - 1 and voc.k ** lvl < 100:
                lvl += 1
            lvl = max(1, min(lvl, voc.levels - 1))
            words = np.asarray(
                transform_words(voc, m.kf_kp_desc[k], m.kf_kp_valid[k])
            )
            div = voc.k ** (voc.levels - lvl)
            self._kp_nodes_cache[k] = np.where(words >= 0, words // div, -1)
        return self._kp_nodes_cache[k]

    # -------------------------------------------------------------- detection

    def _detect(self, m: MapState, kf: int, covis: jnp.ndarray):
        """Returns a loop-candidate KF index or None."""
        if self.db is None:
            self.db = SparseKeyFrameDatabase(
                self.voc.n_words, self.max_keyframes, m.kf_kp_desc.shape[1]
            )
        v = self._kf_bow(m, kf)

        self._seq += 1
        self._slot_seq[kf] = self._seq
        if self._seq - self._last_loop_seq < MIN_KF_GAP or self._seq <= MIN_KF_GAP:
            self.db.add(kf, v)
            self._consistent_groups = []
            return None

        covis_np = np.asarray(covis[kf])
        neighbors = np.nonzero(covis_np >= 15)[0]
        # minScore: lowest BoW similarity among covisible KFs (:124-138).
        v_dense = v.densify(self.voc.n_words)
        min_score = 1.0
        for nb in neighbors:
            if nb in self._bow:
                min_score = min(
                    min_score, float(l1_score_sparse(self._bow[nb], v_dense))
                )

        exclude = np.zeros(self.max_keyframes, bool)
        exclude[kf] = True
        exclude[neighbors] = True
        # Also exclude recent KFs (temporal neighbors) — by insertion
        # sequence, which survives slot recycling.
        exclude[(self._slot_seq >= 0) & (self._slot_seq > self._seq - MIN_KF_GAP)] = True
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

    def _loop_point_mask(self, m: MapState, kf_loop: int, covis: jnp.ndarray):
        """mvpLoopMapPoints (LoopClosing.cc:352-372): every valid point
        observed by the loop KF or its covisible neighborhood, as a (P,)
        mask."""
        P = m.capacity_pt
        nbrs = np.nonzero(np.asarray(covis[kf_loop]) >= 15)[0].tolist()
        nbrs = [k for k in ([kf_loop] + nbrs) if k < int(m.n_kf)]
        obs = m.kf_obs_pt[jnp.asarray(np.array(nbrs, np.int32))]       # (B, N)
        hasv = (obs >= 0) & m.kf_kp_valid[jnp.asarray(np.array(nbrs, np.int32))]
        flat = jnp.where(hasv, obs, P).reshape(-1)
        return jnp.zeros((P + 1,), bool).at[flat].set(True)[:P] & m.pt_valid

    def _project_match_points(self, m: MapState, cam, kf: int, s_cw, R_cw, t_cw,
                              pt_mask, radius_mult: float, max_dist: int):
        """Project masked map points through a Sim3 camera pose S_cw and match
        them against keyframe kf's keypoints (ORBmatcher::SearchByProjection
        with Scw, ORBmatcher.cc:290 / Fuse-with-Scw, :1045). Returns
        (idx (P,): matched keypoint per point, ok (P,))."""
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
            pt_mask & in_img,
            radius_mult * 1.2 ** pred.astype(jnp.float32),
            lo,
            hi,
            m.kf_kp_xy[kf],
            m.kf_kp_desc[kf],
            m.kf_kp_level[kf],
            m.kf_kp_angle[kf],
            m.kf_kp_valid[kf],
            max_dist=max_dist,
        )
        return idx, ok

    def _neighborhood_matches(self, m: MapState, cam, kf_cur: int, kf_loop: int,
                              s21, R21, t21, covis: jnp.ndarray):
        """Project the loop KF's covisible neighborhood's map points into the
        current frame through the corrected S_cw and match
        (LoopClosing::ComputeSim3 final gate, LoopClosing.cc:352-391;
        projection per ORBmatcher.cc:290 with th=10). Returns
        (hit (N,): per-current-keypoint matched mask,
         match_pt (N,): matched loop map point per keypoint or -1 — the
         reference's mvpCurrentMatchedPoints,
         nb_mask (P,): the loop-neighborhood point set)."""
        nb_mask = self._loop_point_mask(m, kf_loop, covis)
        # Corrected S_cw = S21 * T_loop,w.
        s_cw, R_cw, t_cw = sim3_compose(
            s21, R21, t21, jnp.ones(()), m.kf_R[kf_loop], m.kf_t[kf_loop]
        )
        idx, ok = self._project_match_points(
            m, cam, kf_cur, s_cw, R_cw, t_cw, nb_mask, 10.0, TH_LOW
        )
        N = m.kf_obs_pt.shape[1]
        P = m.capacity_pt
        hit = jnp.zeros((N + 1,), bool).at[jnp.where(ok, idx, N)].set(True)[:N]
        match_pt = jnp.full((N + 1,), -1, jnp.int32).at[
            jnp.where(ok, idx, N)
        ].set(jnp.where(ok, jnp.arange(P, dtype=jnp.int32), -1))[:N]
        return hit, match_pt, nb_mask

    def _compute_sim3(self, m: MapState, cam, kf_cur: int, kf_loop: int,
                      covis: jnp.ndarray):
        """Descriptor-match the two KFs' map points, run Sim3 RANSAC, widen
        with mutually-consistent Sim3-guided projection (SearchBySim3),
        refine (OptimizeSim3), then gate on total matches against the loop
        neighborhood's projected points (LoopClosing::ComputeSim3,
        /root/reference/src/LoopClosing.cc:231-391). Returns
        (s, R, t, match_pt, nb_mask) where (s, R, t) maps loop-KF camera
        coords -> current-KF camera coords, match_pt is the per-current-
        keypoint matched loop point (mvpCurrentMatchedPoints) and nb_mask
        the loop-neighborhood point set; or None if rejected."""
        N = m.kf_obs_pt.shape[1]
        obs_c = m.kf_obs_pt[kf_cur]
        obs_l = m.kf_obs_pt[kf_loop]
        has_c = (obs_c >= 0) & m.kf_kp_valid[kf_cur] & m.pt_valid[jnp.maximum(obs_c, 0)]
        has_l = (obs_l >= 0) & m.kf_kp_valid[kf_loop] & m.pt_valid[jnp.maximum(obs_l, 0)]
        pair = has_c[:, None] & has_l[None, :]
        # FeatureVector node constraint (SearchByBoW, ORBmatcher.cc:590):
        # only descriptors quantized under the same intermediate vocabulary
        # node may match. Unconstrained all-pairs matching let ~300
        # perceptually-aliased pairs through on repetitive room texture and
        # a planar false Sim3 survived every later geometric gate.
        nc = jnp.asarray(self._kp_nodes(m, kf_cur))
        nl = jnp.asarray(self._kp_nodes(m, kf_loop))
        pair = pair & (nc[:, None] == nl[None, :]) & (nc >= 0)[:, None]
        idx, dist, ok = match_nn_ratio(
            m.kf_kp_desc[kf_cur], m.kf_kp_desc[kf_loop], pair, max_dist=50, nn_ratio=0.75
        )
        # Rotation-consistency histogram over the initial match set — the
        # reference's SearchByBoW(KF, KF) orientation check
        # (ORBmatcher.cc:669-708). Perceptually-aliased matches (repeating
        # room texture) rarely share one dominant relative orientation, so
        # this filters a large share of false loop-match sets before the
        # Sim3 RANSAC sees them.
        ok = rotation_consistency_mask(
            m.kf_kp_angle[kf_loop][idx], m.kf_kp_angle[kf_cur], ok
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
        nb_hit, match_pt, nb_mask = self._neighborhood_matches(
            m, cam, kf_cur, kf_loop, s, R, t, covis
        )
        total = int(jnp.sum(nb_hit | (merged_ok & inl)))
        if total < self.min_total_matches:
            return None
        # mvpCurrentMatchedPoints: neighborhood projection matches, with the
        # Sim3-inlier pairs (higher confidence) taking precedence.
        sim3_ok = merged_ok & inl
        sim3_pt = jnp.where(sim3_ok, obs_l[merged_idx], -1)
        match_pt = jnp.where(sim3_pt >= 0, sim3_pt, match_pt)
        return s, R, t, match_pt, nb_mask

    # ------------------------------------------------------------ correction

    def _fuse_loop_points(self, m: MapState, cam, kf_cur: int, match_pt,
                          nb_mask, group_poses):
        """Loop fusion + SearchAndFuse (LoopClosing.cc:518-535, 587-643).

        1. For each current-KF keypoint with a matched loop point
           (mvpCurrentMatchedPoints): if the keypoint already holds a map
           point, REPLACE it with the loop point (the loop side wins,
           MapPoint::Replace); otherwise attach the loop point as a new
           observation.
        2. For every keyframe of the corrected neighborhood, project ALL
           loop-side points through its CORRECTED Sim3 pose and fuse
           (ORBmatcher::Fuse with Scw, th=4): matched occupied keypoints
           replace their point with the loop point, free ones gain an
           observation.

        group_poses: {kf_slot: (s, R, t)} corrected S_kw per neighborhood KF.
        Returns the fused MapState.
        """
        P = m.capacity_pt
        obs = np.asarray(m.kf_obs_pt).copy()
        ptv = np.asarray(m.pt_valid).copy()
        repl = np.arange(P, dtype=np.int64)

        def replace(old: int, new: int):
            # Loop point wins (pCurMP->Replace(pLoopMP) / pRep->Replace).
            repl[old] = new
            ptv[old] = False

        mp = np.asarray(match_pt)
        for i in np.nonzero(mp >= 0)[0]:
            q = int(mp[i])
            if not ptv[q]:
                continue
            cur = int(obs[kf_cur, i])
            if cur >= 0 and cur != q and ptv[cur]:
                replace(cur, q)
            else:
                obs[kf_cur, i] = q

        for g, (sg, Rg, tg) in group_poses.items():
            idx, ok = self._project_match_points(
                m, cam, g, sg, Rg, tg, nb_mask, 4.0, TH_LOW
            )
            idxn, okn = np.asarray(idx), np.asarray(ok)
            for p in np.nonzero(okn)[0]:
                p = int(p)
                if not ptv[p]:
                    continue
                kp = int(idxn[p])
                q = int(obs[g, kp])
                if q >= 0 and q != p and ptv[q]:
                    replace(q, p)
                elif q < 0:
                    obs[g, kp] = p

        # Resolve short replacement chains, then redirect every observation
        # (MapPoint::Replace's global forwarding, MapPoint.cc:177).
        repl = repl[repl]
        repl = repl[repl]
        obs = np.where(obs >= 0, repl[np.maximum(obs, 0)], obs)
        # Export the replacement for the TRACKER's live frame references:
        # the reference's Tracking::CheckReplacedInLastFrame follows
        # mpReplaced pointers (Tracking.cc:791); with slot indices the
        # forwarding must be applied to _last_obs explicitly, or tracking
        # keeps referencing merged-away (invalid) duplicates after a
        # closure — covisibility then never bridges the loop and every
        # revisit keyframe re-triggers "loop" detection.
        self.last_point_remap = repl.astype(np.int32)
        m = m._replace(kf_obs_pt=jnp.asarray(obs.astype(np.int32)),
                       pt_valid=jnp.asarray(ptv))
        # Refresh representative descriptors of the surviving loop points
        # (ComputeDistinctiveDescriptors after fusion, LoopClosing.cc:533).
        from tpuslam.mapstate.core import compute_point_descriptors

        touched = nb_mask & m.pt_valid
        if bool(jnp.any(touched)):
            m = compute_point_descriptors(m, touched)
        return m

    def _correct(self, m: MapState, cam, kf_cur: int, kf_loop: int, s21, R21, t21,
                 covis: jnp.ndarray, ba_fn=None, match_pt=None, nb_mask=None):
        """CorrectLoop (:402): Sim3 propagation to the covisible group, loop
        point fusion + SearchAndFuse, new-covisibility loop connections,
        OptimizeEssentialGraph (with persistent loop edges from EVERY prior
        closure), point correction, global BA."""
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
        group_poses = {}
        for g in sorted(group):
            Rrel, trel = se3_compose(m.kf_R[g], m.kf_t[g], *Tc_inv)
            sg, Rg, tg = sim3_compose(
                jnp.asarray(1.0), Rrel, trel, s_corr, R_corr, t_corr
            )
            s_init = s_init.at[g].set(sg)
            R_init = R_init.at[g].set(Rg)
            t_init = t_init.at[g].set(tg)
            group_poses[g] = (sg, Rg, tg)

        # --- Loop fusion + SearchAndFuse (LoopClosing.cc:518-543) ---------
        if match_pt is not None and nb_mask is not None:
            m = self._fuse_loop_points(
                m, cam, kf_cur, match_pt, nb_mask, group_poses
            )

        # --- New covisibility connections (LoopClosing.cc:546-564) --------
        # Fusion creates shared observations across the loop; links that did
        # not exist before correction (and are not intra-group) become loop
        # connections in the essential graph, gated at the strong-covis
        # weight except the (current, loop) pair itself (Optimizer.cc:862).
        covis_post = covisibility_weights(m)
        covis_post_np = np.asarray(covis_post)
        covis_pre_np = np.asarray(covis)
        valid_np = np.asarray(m.kf_valid)
        group_arr = np.asarray(sorted(group), np.int64)
        in_group = np.zeros(m.capacity_kf, bool)
        in_group[group_arr] = True
        newly = (
            (covis_post_np[group_arr] >= 15)
            & (covis_pre_np[group_arr] < 15)
            & valid_np[None, :]
            & ~in_group[None, :]
        )  # (G, K)
        strong_new = covis_post_np[group_arr] >= STRONG_COVIS
        is_loop_pair = np.zeros_like(newly)
        if kf_cur in group:
            is_loop_pair[int(np.nonzero(group_arr == kf_cur)[0][0]), kf_loop] = True
        gi, bi = np.nonzero(newly & (strong_new | is_loop_pair))
        loop_connections = [
            (int(group_arr[g]), int(b)) for g, b in zip(gi, bi)
        ]

        # Essential-graph edges from PRE-correction poses: spanning tree
        # (sequential parent), strong covisibility, plus the loop edge with
        # the measured constraint. Enumeration is fully vectorized (the
        # round-3 version was an O(K^2) Python double loop — ~2.4M
        # iterations per closure at the 1536-KF capacity).
        covis_np = np.asarray(covis)
        # Temporal chain over VALID keyframes in FRAME-ID order (slot order
        # stops tracking time once culled slots are recycled); culled KFs
        # are not graph vertices — their exported poses resolve through
        # their spanning-tree parents, which ARE corrected here.
        fid_np = np.asarray(m.kf_frame_id)
        order = sorted(np.nonzero(valid_np)[0].tolist(), key=lambda k: int(fid_np[k]))
        ov = np.asarray(order, np.int64)
        npos = len(ov)
        # Chain edges a->next; then strong-covisibility edges at chain
        # distance >= 2 (Optimizer.cc:806,952 weight >= 100), from a dense
        # mask over chain positions.
        chain_a, chain_b = ov[:-1], ov[1:]
        pa = np.arange(npos)
        strong = (
            (pa[None, :] >= pa[:, None] + 2)
            & (covis_np[np.ix_(ov, ov)] >= STRONG_COVIS)
        )
        sa, sb = np.nonzero(strong)
        old_a = np.concatenate([chain_a, ov[sa]]).astype(np.int64)
        old_b = np.concatenate([chain_b, ov[sb]]).astype(np.int64)
        seen_pairs = {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in zip(old_a, old_b)
        }
        seen_pairs.add((min(kf_loop, kf_cur), max(kf_loop, kf_cur)))

        # New loop connections: measurement from the group-CORRECTED poses
        # (Optimizer.cc:853-870 takes Sji from vScw, which holds CorrectedSim3
        # for the propagated group and identity-scale current poses else).
        init_a, init_b = [], []
        for a, b in loop_connections:
            key = (min(a, b), max(a, b))
            if key in seen_pairs:
                continue
            seen_pairs.add(key)
            init_a.append(a)
            init_b.append(b)

        # Persistent loop edges from PRIOR closures (KeyFrame::AddLoopEdge →
        # Optimizer.cc:926-950): measurement re-derived from the CURRENT
        # (pre-correction) poses, exactly like the reference's later runs.
        fid_to_slot = {
            int(fid_np[k]): k for k in order
        }
        for fa, fb in self._loop_edges:
            a = fid_to_slot.get(fa)
            b = fid_to_slot.get(fb)
            if a is None or b is None:
                continue  # one side culled; constraint already baked in
            key = (min(a, b), max(a, b))
            if key in seen_pairs:
                continue
            seen_pairs.add(key)
            old_a = np.append(old_a, a)
            old_b = np.append(old_b, b)

        # Measurements in TWO batched make_relative calls (one per source
        # pose set) instead of several jnp dispatches per edge.
        ia, ib = jnp.asarray(old_a), jnp.asarray(old_b)
        msA, mRA, mtA = make_relative(
            s_old[ia], R_old[ia], t_old[ia], s_old[ib], R_old[ib], t_old[ib]
        )
        ei = np.concatenate([old_a, [kf_loop]])
        ej = np.concatenate([old_b, [kf_cur]])
        ms = jnp.concatenate([msA, jnp.asarray(s21)[None]])
        mR = jnp.concatenate([mRA, jnp.asarray(R21)[None]])
        mt = jnp.concatenate([mtA, jnp.asarray(t21)[None]])
        if init_a:
            ja, jb = jnp.asarray(np.asarray(init_a)), jnp.asarray(np.asarray(init_b))
            msB, mRB, mtB = make_relative(
                s_init[ja], R_init[ja], t_init[ja],
                s_init[jb], R_init[jb], t_init[jb],
            )
            ei = np.concatenate([ei, init_a])
            ej = np.concatenate([ej, init_b])
            ms = jnp.concatenate([ms, msB])
            mR = jnp.concatenate([mR, mRB])
            mt = jnp.concatenate([mt, mtB])
        ei = ei.astype(np.int64)
        ej = ej.astype(np.int64)

        # Introspection hook for tests: the slot pairs in this graph.
        self._last_edge_slots = [(int(a), int(b)) for a, b in zip(ei, ej)]

        edges = Sim3Edges(
            i=jnp.asarray(ei.astype(np.int32)),
            j=jnp.asarray(ej.astype(np.int32)),
            meas_s=ms,
            meas_R=mR,
            meas_t=mt,
            valid=jnp.ones(len(ei), bool),
            weight=jnp.ones((len(ei),), jnp.float32),
        )
        # Dense-vs-CG by LIVE node count, not padded capacity: small sessions
        # compact the live keyframes into a fixed 192-slot problem (one
        # compile) and take the dense (7*192)^2 solve; only graphs that are
        # actually large pay the matrix-free PCG path.
        DENSE_NODES = 192
        n_live = len(order)
        if n_live <= DENSE_NODES and K > DENSE_NODES:
            comp = np.full(K, DENSE_NODES - 1, np.int32)
            comp[np.array(order, np.int64)] = np.arange(n_live, dtype=np.int32)
            sel = jnp.asarray(
                np.array(order + [order[-1]] * (DENSE_NODES - n_live), np.int32)
            )
            comp_j = jnp.asarray(comp)
            edges_c = edges._replace(i=comp_j[edges.i], j=comp_j[edges.j])
            nvalid = jnp.arange(DENSE_NODES) < n_live
            nfixed = jnp.zeros((DENSE_NODES,), bool).at[int(comp[kf_loop])].set(True)
            s_c, R_c, t_c, errs = optimize_pose_graph(
                s_init[sel], R_init[sel], t_init[sel], nvalid, nfixed,
                edges_c, iters=15, fix_scale=self.fix_scale,
                dense_max_nodes=DENSE_NODES,
            )
            live = jnp.asarray(np.array(order, np.int32))
            s_new = s_init.at[live].set(s_c[:n_live])
            R_new = R_init.at[live].set(R_c[:n_live])
            t_new = t_init.at[live].set(t_c[:n_live])
        else:
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
        # so3_project: keep stored rotations exactly orthonormal (see
        # geometry/se3.py — transpose-inverses amplify any drift).
        from tpuslam.geometry.se3 import so3_project
        t_se3 = t_new / jnp.maximum(s_new, 1e-9)[:, None]
        m = m._replace(kf_R=so3_project(R_new), kf_t=t_se3, pt_xyz=pt_xyz)

        # Full BA (the reference's post-loop global BA, :645).
        if ba_fn is not None:
            m = ba_fn(m)
        # Persist the loop edge for every later essential graph
        # (mpMatchedKF->AddLoopEdge(mpCurrentKF) + reverse, LoopClosing.cc:573).
        pair = (int(fid_np[kf_loop]), int(fid_np[kf_cur]))
        if pair not in self._loop_edges:
            self._loop_edges.append(pair)
        self._last_loop_seq = self._seq
        self.n_loops_closed += 1
        return m

    # --------------------------------------------------------------- public

    def on_keyframe(self, m: MapState, cam, kf_cur: int, ba_fn=None):
        """Run detection + closure for a newly inserted keyframe.
        Returns (map, closed: bool)."""
        self.last_point_remap = None
        if not self._ensure_vocabulary(m):
            return m, False
        self._reconcile(m)
        covis = covisibility_weights(m)
        cand = self._detect(m, kf_cur, covis)
        if cand is None:
            return m, False
        import os as _os

        debug = _os.environ.get("TPUSLAM_LOOP_DEBUG")
        if debug:
            fid = np.asarray(m.kf_frame_id)
            print(
                f"[loop] candidate: cur slot {kf_cur} (frame {int(fid[kf_cur])})"
                f" <- cand slot {cand} (frame {int(fid[cand])}), "
                f"covis(cur,cand)={float(covis[kf_cur, cand]):.0f}",
                flush=True,
            )
        sim3 = self._compute_sim3(m, cam, kf_cur, cand, covis)
        if sim3 is None:
            if debug:
                print("[loop] sim3 rejected", flush=True)
            return m, False
        s21, R21, t21, match_pt, nb_mask = sim3
        # Odometric-consistency gate (deviation from the reference,
        # documented): the measured Sim3 implies a correction
        # |t21 - t_rel| relative to the CURRENT odometry between the two
        # keyframes; real drift is bounded by a fraction of the path
        # length travelled between them, while a perceptually-aliased
        # false loop (repetitive texture: same words, geometrically
        # consistent planar match sets that survive every appearance and
        # reprojection gate) demands a correction far beyond any plausible
        # drift. stereo_room_big produced exactly such a candidate 73
        # frames apart: implied correction 7.0 m over a 2.9 m path. The
        # budget is generous (30% of path + 0.5 floor; mono adds scale
        # slack) so genuine loop closures — whose purpose is to absorb
        # REAL drift — pass untouched.
        Rrel, trel = se3_compose(
            m.kf_R[kf_cur], m.kf_t[kf_cur],
            *se3_inverse(m.kf_R[cand], m.kf_t[cand])
        )
        d_t = float(np.linalg.norm(np.asarray(t21) - np.asarray(trel)))
        dR = np.asarray(R21) @ np.asarray(Rrel).T
        d_ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        path = self._path_length_between(m, cand, kf_cur)
        # Budgets: good visual odometry drifts ~1% of path translationally
        # and fractions of a degree per unit; 5x headroom stereo, 15x mono
        # (free scale). The aliases this rejects demand corrections that
        # are CONSTANT in path (room-symmetry offsets), so a fractional
        # budget separates them from true drift at every path length; the
        # rotation gate catches pure-rotation aliases (same spot, wrong
        # wall) whose translation error is small.
        frac = 0.05 if self.fix_scale else 0.15
        budget = max(0.3, frac * path)
        budget_rot = max(5.0, 0.5 * path)
        if d_t > budget or d_ang > budget_rot:
            if debug:
                print(
                    f"[loop] REJECTED by odometric gate: implied correction "
                    f"{d_t:.2f} / rot {d_ang:.1f}deg over a {path:.2f}-long "
                    f"path; budgets {budget:.2f} / {budget_rot:.1f}deg",
                    flush=True,
                )
            return m, False
        if debug:
            ang = np.rad2deg(
                np.arccos(np.clip((np.trace(np.asarray(R21)) - 1) / 2, -1, 1))
            )
            print(
                f"[loop] CLOSING: s={float(s21):.4f} rot={ang:.2f}deg "
                f"|t|={float(jnp.linalg.norm(t21)):.3f} "
                f"matches={int(jnp.sum(match_pt >= 0))} "
                f"drift: rot={d_ang:.2f}deg |dt|={d_t:.3f} path={path:.2f}",
                flush=True,
            )
        m = self._correct(
            m, cam, kf_cur, cand, s21, R21, t21, covis,
            ba_fn=ba_fn, match_pt=match_pt, nb_mask=nb_mask,
        )
        return m, True

    @staticmethod
    def _path_length_between(m: MapState, a: int, b: int) -> float:
        """Odometry path length between keyframes a and b: camera-center
        polyline over the valid keyframes in frame-id order between them."""
        fid = np.asarray(m.kf_frame_id)
        valid = np.asarray(m.kf_valid)
        lo, hi = sorted((int(fid[a]), int(fid[b])))
        sel = np.nonzero(valid & (fid >= lo) & (fid <= hi))[0]
        if len(sel) < 2:
            return 0.0
        order = sel[np.argsort(fid[sel])]
        R = np.asarray(m.kf_R[order])
        t = np.asarray(m.kf_t[order])
        C = -np.einsum("kij,ki->kj", R.transpose(0, 2, 1), t)
        return float(np.sum(np.linalg.norm(np.diff(C, axis=0), axis=1)))
