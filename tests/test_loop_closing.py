"""Map-level loop-closing test: a synthetically drifted loop trajectory with
duplicate revisit points must be detected, Sim3-solved, and corrected.

Constructed directly on MapState (full control over drift), exercising
LoopCloser.on_keyframe end to end: lazy vocabulary training, BoW detection
with consistency chaining, Sim3 RANSAC between matched map points, pose
graph + point correction.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.geometry import se3_apply, se3_exp, so3_exp, se3_compose, project
from tpuslam.geometry.camera import PinholeCamera
from tpuslam.mapstate.core import FrameFeatures, insert_keyframe, insert_points, make_empty_map
from tpuslam.pipeline.loop_closing import LoopCloser

CAM = PinholeCamera(fx=400.0, fy=400.0, cx=160.0, cy=120.0, width=320, height=240)
N_KP = 200


def build_loop_map(rng, n_kf=16, drift=0.012, revisit=True):
    """Cameras on a circle facing outward at point clusters on the walls.

    Returns (map, gt poses, drifted poses). The LAST 3 keyframes revisit
    clusters 0 and 1 through DUPLICATE point entries (identical descriptors,
    drift-displaced positions) — the post-drift situation loop closing must
    recognize. The 3-KF revisit matches the covisibility-consistency chain
    length of the reference (LoopClosing.cc:43).
    """
    R_circle = 6.0
    clusters = []
    cluster_desc = []
    for k in range(n_kf):
        ang = 2 * np.pi * k / n_kf
        center = np.array(
            [(R_circle + 4.0) * np.sin(ang), 0.0, -(R_circle + 4.0) * np.cos(ang)]
        )
        pts = center + rng.uniform(-1.5, 1.5, (40, 3))
        clusters.append(pts.astype(np.float32))
        cluster_desc.append(rng.integers(0, 2**32, (40, 8), dtype=np.uint32))

    gt = []
    for k in range(n_kf):
        ang = 2 * np.pi * k / n_kf
        C = np.array([R_circle * np.sin(ang), 0.0, -R_circle * np.cos(ang)], np.float32)
        # Camera forward (+z in camera coords) points outward through C:
        # d = [sin(ang), 0, -cos(ang)] = roty(pi - ang) @ [0, 0, 1].
        Rwc = np.asarray(so3_exp(jnp.asarray(np.array([0.0, np.pi - ang, 0.0], np.float32))))
        R = Rwc.T
        t = -R @ C
        gt.append((R.astype(np.float32), t.astype(np.float32)))

    drifted = [gt[0]]
    for k in range(1, n_kf):
        R_prev_gt, t_prev_gt = gt[k - 1]
        R_gt, t_gt = gt[k]
        Rrel = R_gt @ R_prev_gt.T
        trel = t_gt - Rrel @ t_prev_gt
        dR = np.asarray(so3_exp(jnp.asarray(np.array([0, drift, 0], np.float32))))
        Rrel_n = dR @ Rrel
        trel_n = trel + np.array([drift, 0, 0], np.float32)
        R_prev, t_prev = drifted[k - 1]
        drifted.append((Rrel_n @ R_prev, Rrel_n @ t_prev + trel_n))

    m = make_empty_map(
        max_kf=max(24, n_kf + 8),
        n_features=N_KP,
        max_pt=max(2400, n_kf * 44 + 400),
    )
    prev_own_slots = None
    prev2_own_slots = None
    dup_slots = None
    n_revisit = 3 if revisit else 0
    N_WEAK = 20  # weak covisibility tail (k-2), keeps minScore realistic

    for k in range(n_kf):
        R_d, t_d = drifted[k]
        own = clusters[k]
        own_desc = cluster_desc[k]
        prev = clusters[k - 1] if k > 0 else clusters[0]
        prev_desc = cluster_desc[k - 1] if k > 0 else cluster_desc[0]
        weak = clusters[k - 2][:N_WEAK] if k > 1 else clusters[0][:N_WEAK]
        weak_desc = cluster_desc[k - 2][:N_WEAK] if k > 1 else cluster_desc[0][:N_WEAK]
        is_revisit = k >= n_kf - n_revisit
        if is_revisit:
            extra = [clusters[0], clusters[1]]
            extra_desc = [cluster_desc[0], cluster_desc[1]]
        else:
            extra, extra_desc = [], []

        pts_w_gt = np.concatenate([own, prev, weak] + extra, axis=0)
        descs = np.concatenate([own_desc, prev_desc, weak_desc] + extra_desc, axis=0)
        n_obs = len(pts_w_gt)
        assert n_obs <= N_KP

        R_gt, t_gt = gt[k]
        # Camera-frame geometry is the gt view; stored world position maps it
        # through the DRIFTED pose, so each creating KF is self-consistent.
        Xc = np.asarray(se3_apply(jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(pts_w_gt)))
        X_map = np.asarray((Xc - t_d) @ R_d)  # R_d^T (Xc - t_d)

        desc_arr = np.zeros((N_KP, 8), np.uint32)
        desc_arr[:n_obs] = descs
        valid = np.zeros(N_KP, bool)
        valid[:n_obs] = True

        n_own = len(own)
        obs = np.full(N_KP, -1, np.int32)
        new_mask = np.zeros(N_KP, bool)
        new_mask[:n_own] = True
        # The FIRST revisit KF creates duplicate entries for clusters 0+1;
        # later revisit KFs observe those same duplicates (covisibility).
        creates_dups = is_revisit and dup_slots is None
        if creates_dups:
            new_mask[n_own + 40 : n_obs] = True
        m, slots = insert_points(
            m,
            jnp.asarray(np.pad(X_map, ((0, N_KP - n_obs), (0, 0)))),
            jnp.asarray(desc_arr),
            k,
            jnp.asarray(new_mask),
            jnp.zeros((N_KP, 3)),
            jnp.zeros(N_KP),
            jnp.full((N_KP,), jnp.inf),
        )
        slots = np.asarray(slots)
        obs[new_mask] = slots[new_mask]
        n_pw = n_own + 40 + N_WEAK  # end of own+prev+weak block
        if k > 0:
            obs[n_own : n_own + 40] = prev_own_slots
        if k > 1:
            obs[n_own + 40 : n_pw] = prev2_own_slots[:N_WEAK]
        if is_revisit:
            if creates_dups:
                dup_slots = slots[n_pw : n_obs].copy()
            else:
                obs[n_pw : n_obs] = dup_slots
        if not is_revisit:
            prev2_own_slots = prev_own_slots.copy() if prev_own_slots is not None else slots[:n_own].copy()
            prev_own_slots = slots[:n_own].copy()

        # Observations: project the STORED map positions through the drifted
        # pose — the map is locally consistent (as a BA-maintained map is);
        # drift appears only between duplicates and their originals.
        Xs = np.asarray(m.pt_xyz)[np.maximum(obs, 0)]
        uv_all = np.asarray(
            project(CAM, se3_apply(jnp.asarray(R_d), jnp.asarray(t_d), jnp.asarray(Xs)))
        )
        xy = np.where((obs >= 0)[:, None], uv_all, 0.0).astype(np.float32)
        feats = FrameFeatures(
            xy=jnp.asarray(xy),
            level=jnp.zeros(N_KP, jnp.int32),
            angle=jnp.zeros(N_KP),
            desc=jnp.asarray(desc_arr),
            valid=jnp.asarray(valid),
            u_right=jnp.full((N_KP,), -1.0),
            depth=jnp.zeros(N_KP),
        )
        m, _ = insert_keyframe(
            m, feats, jnp.asarray(R_d), jnp.asarray(t_d), k, jnp.asarray(obs)
        )
    return m, gt, drifted


class TestLoopClosing:
    def test_detects_and_corrects_loop(self, rng):
        m, gt, drifted = build_loop_map(rng)
        n_kf = len(gt)
        lc = LoopCloser(max_keyframes=24, fix_scale=False, min_sim3_inliers=15)
        closed_any = False
        for k in range(n_kf):
            m, closed = lc.on_keyframe(m, CAM, k, ba_fn=None)
            closed_any = closed_any or closed
        assert closed_any, "loop never closed"
        assert lc.n_loops_closed >= 1

        # Drift at the loop end must shrink: compare last-KF camera center
        # against gt before/after.
        C_gt = -gt[-1][0].T @ gt[-1][1]
        C_drift = -drifted[-1][0].T @ drifted[-1][1]
        R_fin = np.asarray(m.kf_R[n_kf - 1])
        t_fin = np.asarray(m.kf_t[n_kf - 1])
        C_fin = -R_fin.T @ t_fin
        err_before = np.linalg.norm(C_drift - C_gt)
        err_after = np.linalg.norm(C_fin - C_gt)
        assert err_after < 0.5 * err_before, (err_before, err_after)

    def test_no_false_loops_on_distinct_content(self, rng):
        """Without revisit duplicates, no loop should be declared."""
        m, gt, drifted = build_loop_map(rng, drift=0.0, revisit=False)
        lc = LoopCloser(max_keyframes=24, fix_scale=False, min_sim3_inliers=15)
        closed_any = False
        for k in range(len(gt)):
            m, closed = lc.on_keyframe(m, CAM, k, ba_fn=None)
            closed_any = closed_any or closed
        assert not closed_any

    def test_recycled_slot_invalidates_detection_state(self, rng):
        """KF slot recycling must not leave stale per-slot state behind:
        the recycled slot's cached BoW vector and database row must be
        refreshed for the NEW occupant, and temporal gating must follow
        insertion order, not slot index (ADVICE round 1, medium)."""
        m, gt, drifted = build_loop_map(rng, drift=0.0, revisit=False)
        lc = LoopCloser(max_keyframes=24, fix_scale=False, min_sim3_inliers=15)
        for k in range(len(gt)):
            m, _ = lc.on_keyframe(m, CAM, k, ba_fn=None)
        assert 2 in lc._bow
        old_bow2 = np.asarray(lc._bow[2].densify(lc.voc.n_words)).copy()
        seq_before = int(lc._slot_seq[2])

        # Recycle slot 2: new occupant (new frame id, new descriptors).
        new_desc = rng.integers(
            0, 2 ** 32, tuple(m.kf_kp_desc.shape[1:]), dtype=np.uint32
        )
        m = m._replace(
            kf_frame_id=m.kf_frame_id.at[2].set(99),
            kf_kp_desc=m.kf_kp_desc.at[2].set(jnp.asarray(new_desc)),
        )
        m, _ = lc.on_keyframe(m, CAM, 2, ba_fn=None)
        # New occupant is temporally RECENT: newest sequence number.
        assert int(lc._slot_seq[2]) > seq_before
        assert int(lc._slot_seq[2]) == lc._seq
        # BoW cache and database row reflect the new occupant.
        new_bow2 = np.asarray(lc._bow[2].densify(lc.voc.n_words))
        assert not np.allclose(new_bow2, old_bow2)
        assert np.allclose(np.asarray(lc.db.words[2]), np.asarray(lc._bow[2].words))
        assert np.allclose(np.asarray(lc.db.weight[2]), np.asarray(lc._bow[2].weight))

        # Culling a KF erases its database row and BoW cache on reconcile.
        m2 = m._replace(kf_valid=m.kf_valid.at[3].set(False))
        lc._reconcile(m2)
        assert not bool(lc.db.has[3])
        assert 3 not in lc._bow

    def test_loop_fusion_merges_duplicates_and_links_covisibility(self, rng):
        """CorrectLoop aftermath (LoopClosing.cc:518-643): after closing,
        duplicate cross-loop landmarks are merged (valid-point count drops)
        and the revisit keyframes gain covisibility edges (>= 15 shared
        points) with the loop side — links that did NOT exist before."""
        from tpuslam.mapstate.core import covisibility_weights

        m, gt, drifted = build_loop_map(rng)
        n_kf = len(gt)
        lc = LoopCloser(max_keyframes=24, fix_scale=False, min_sim3_inliers=15)
        covis_pre = np.asarray(covisibility_weights(m))
        # Revisit KFs (last 3) observe DUPLICATE entries, not the originals:
        # no pre-existing covisibility with the loop side.
        assert covis_pre[n_kf - 1, 0] < 15 and covis_pre[n_kf - 1, 1] < 15

        n_valid_before = int(jnp.sum(m.pt_valid))
        closed_at = None
        for k in range(n_kf):
            m, closed = lc.on_keyframe(m, CAM, k, ba_fn=None)
            if closed and closed_at is None:
                closed_at = k
        assert closed_at is not None

        n_valid_after = int(jnp.sum(m.pt_valid))
        assert n_valid_after < n_valid_before, "no duplicates merged"

        covis_post = np.asarray(covisibility_weights(m))
        cross = covis_post[closed_at, 0] >= 15 or covis_post[closed_at, 1] >= 15
        assert cross, (
            "loop fusion did not create cross-loop covisibility: "
            f"{covis_post[closed_at, :4]}"
        )
        # The loop edge persists (KeyFrame::AddLoopEdge).
        assert len(lc._loop_edges) == 1
        # The fusion exported its MapPoint::Replace forwarding for the
        # tracker's live references (Tracking::CheckReplacedInLastFrame
        # analog): merged-away slots redirect to their surviving winner.
        repl = lc.last_point_remap
        assert repl is not None
        merged = np.nonzero(~np.asarray(m.pt_valid))[0]
        redirected = repl[merged] != merged
        assert redirected.any()
        # Every redirect target is a live point.
        tgt = repl[merged][redirected]
        assert np.asarray(m.pt_valid)[tgt].all()

    def test_second_essential_graph_includes_first_loop_edge(self, rng):
        """A later essential-graph run must include every PRIOR loop edge
        (Optimizer.cc:926-950 walks KeyFrame::GetLoopEdges)."""
        from tpuslam.mapstate.core import covisibility_weights

        m, gt, drifted = build_loop_map(rng)
        n_kf = len(gt)
        lc = LoopCloser(max_keyframes=24, fix_scale=False, min_sim3_inliers=15)
        for k in range(n_kf):
            m, closed = lc.on_keyframe(m, CAM, k, ba_fn=None)
        assert lc._loop_edges, "first loop never closed"
        (fid_l, fid_c) = lc._loop_edges[0]
        slot_l = int(np.nonzero(np.asarray(m.kf_frame_id) == fid_l)[0][0])
        slot_c = int(np.nonzero(np.asarray(m.kf_frame_id) == fid_c)[0][0])

        # Drive a SECOND correction between a different pair (identity Sim3 —
        # geometry is irrelevant here; the graph structure is under test).
        covis = covisibility_weights(m)
        m2 = lc._correct(
            m, CAM, kf_cur=n_kf - 2, kf_loop=1,
            s21=jnp.asarray(1.0), R21=jnp.eye(3), t21=jnp.zeros(3),
            covis=covis,
        )
        pairs = {(min(a, b), max(a, b)) for a, b in lc._last_edge_slots}
        assert (min(slot_l, slot_c), max(slot_l, slot_c)) in pairs, (
            "first loop's persistent edge missing from the second "
            f"essential graph: {sorted(pairs)[:10]}"
        )
