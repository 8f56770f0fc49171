"""Jit-compiled step functions for the tracking / mapping pipeline.

Each function is pure over (MapState, frame arrays) and static config, so it
compiles once per capacity configuration. They mirror the stages of
Tracking::Track (/root/reference/src/Tracking.cc:285) and
LocalMapping::Run (/root/reference/src/LocalMapping.cc:47).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry.camera import PinholeCamera, project
from tpuslam.geometry.se3 import se3_apply, se3_compose, se3_inverse
from tpuslam.geometry.triangulation import triangulate_two_view
from tpuslam.mapstate.core import (
    FrameFeatures,
    MapState,
    covisibility_weights,
    shared_point_counts,
)
from tpuslam.matching.hamming import hamming_matrix
from tpuslam.matching.search import (
    TH_HIGH,
    TH_LOW,
    match_nn_ratio,
    resolve_duplicates,
    rotation_consistency_mask,
    search_by_projection_points,
)
from tpuslam.optim.ba import BAProblem, dense_schur_bundle_adjustment
from tpuslam.optim.pose import PoseObs, pose_optimization

_BIG = 1 << 20


def predict_scale(dist, max_dist, scale_factor: float, n_levels: int):
    """MapPoint::PredictScale (/root/reference/src/MapPoint.cc:385): octave
    at which the point would be detected at this viewing distance."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-9), 1e-9)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor)).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)


@partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels", "th"))
def track_motion_model(
    cam: PinholeCamera,
    m: MapState,
    last_feats: FrameFeatures,
    last_obs_pt: jnp.ndarray,
    R_pred: jnp.ndarray,
    t_pred: jnp.ndarray,
    cur: FrameFeatures,
    inv_sigma2_table: jnp.ndarray,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    th: float = 7.0,
):
    """TrackWithMotionModel (/root/reference/src/Tracking.cc:919): project the
    last frame's map points with the predicted pose, match in a window, then
    pose-optimize. Returns (R, t, obs_pt (N,), n_inliers).
    """
    pt_idx = last_obs_pt  # (N,) map point per last-frame keypoint
    has_pt = (pt_idx >= 0) & last_feats.valid & m.pt_valid[jnp.maximum(pt_idx, 0)]
    Xw = m.pt_xyz[jnp.maximum(pt_idx, 0)]
    R, t, obs_pt2, _, n_map, _, n_matches = track_motion_model_pts(
        cam, last_feats, Xw, pt_idx, has_pt, R_pred, t_pred, cur,
        inv_sigma2_table, scale_factor=scale_factor, n_levels=n_levels, th=th,
    )
    return R, t, obs_pt2, n_map, n_matches


@partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels", "th"))
def track_motion_model_pts(
    cam: PinholeCamera,
    last_feats: FrameFeatures,
    last_xyz: jnp.ndarray,
    last_tag: jnp.ndarray,
    last_has: jnp.ndarray,
    R_pred: jnp.ndarray,
    t_pred: jnp.ndarray,
    cur: FrameFeatures,
    inv_sigma2_table: jnp.ndarray,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    th: float = 7.0,
):
    """Motion-model tracking core over explicit per-keypoint world points.

    Generalizes TrackWithMotionModel to points not resident in the map: the
    localization-mode "visual odometry" points the reference unprojects from
    the last frame's stereo/RGB-D depths (/root/reference/src/Tracking.cc:
    859-916) carry tag = -1; map points carry their slot index as tag.

    last_xyz: (N, 3) world position per last-frame keypoint;
    last_tag:  (N,) map point slot or -1 (VO point); last_has: (N,) valid.
    Returns (R, t, cur_tag (N,), cur_xyz (N, 3), n_map_inliers,
    n_total_inliers, n_matches) — cur_tag/cur_xyz describe the matches the
    current frame inherits (tag -1 + finite xyz = VO point carried
    forward); n_matches is the PRE-optimization match count, which the
    caller must gate at >= 20 before trusting the pose (Tracking.cc:
    944-947 — a handful of aliased window matches can "converge" with 10+
    inliers at a wildly wrong pose).
    """
    N = cur.xy.shape[0]
    p_cam = se3_apply(R_pred, t_pred, last_xyz)
    uv = project(cam, p_cam)
    in_front = p_cam[..., 2] > 0.05
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < cam.width) & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    )
    proj_valid = last_has & in_front & in_img

    radius = th * scale_factor ** last_feats.level.astype(jnp.float32)
    idx, dist, ok = search_by_projection_points(
        uv,
        last_feats.desc,
        proj_valid,
        radius,
        jnp.maximum(last_feats.level - 1, 0),
        last_feats.level + 1,
        cur.xy,
        cur.desc,
        cur.level,
        cur.angle,
        cur.valid,
        max_dist=TH_HIGH,
        nn_ratio=0.0,
    )
    ok = rotation_consistency_mask(last_feats.angle, cur.angle[idx], ok)

    # Assignment for the current frame: keypoint idx[e] inherits last
    # keypoint e's point (tag + world position) for each accepted match e.
    # Rejected rows scatter out of bounds (dropped); accepted rows have
    # unique targets (resolve_duplicates inside the search).
    idx_eff = jnp.where(ok, idx, N)
    cur_tag = jnp.full((N,), -2, jnp.int32).at[idx_eff].set(last_tag)  # -2 = unmatched
    cur_xyz = jnp.zeros((N, 3)).at[idx_eff].set(last_xyz)
    matched = jnp.zeros((N,), bool).at[idx_eff].set(True) & cur.valid
    cur_tag = jnp.where(matched, cur_tag, -2)
    cur_xyz = jnp.where(matched[:, None], cur_xyz, 0.0)
    n_matches = jnp.sum(matched)

    uvr = jnp.concatenate([cur.xy, cur.u_right[:, None]], axis=-1)
    inv_s2 = inv_sigma2_table[jnp.clip(cur.level, 0, inv_sigma2_table.shape[0] - 1)]
    obs = PoseObs(pts_w=cur_xyz, uvr=uvr, inv_sigma2=inv_s2, valid=matched)
    R, t, inliers, n_tot = pose_optimization(cam, R_pred, t_pred, obs)
    cur_tag = jnp.where(matched & ~inliers, -2, cur_tag)
    cur_xyz = jnp.where((matched & ~inliers)[:, None], 0.0, cur_xyz)
    n_map = jnp.sum(inliers & (cur_tag >= 0))
    return R, t, cur_tag, cur_xyz, n_map, n_tot, n_matches


@partial(jax.jit, static_argnames=("cam",))
def track_reference_keyframe(
    cam: PinholeCamera,
    m: MapState,
    kf: jnp.ndarray,
    cur: FrameFeatures,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
):
    """TrackReferenceKeyFrame (/root/reference/src/Tracking.cc:809):
    descriptor-match the current frame against the reference keyframe's map
    points, then pose-optimize from the last frame's pose. The reference
    constrains candidate pairs to a shared BoW node (ORBmatcher::SearchByBoW,
    ORBmatcher.cc:159) purely as a speed device; the dense masked matching
    here is its superset (same ratio 0.7 + rotation-consistency gates).

    Returns (R, t, obs_pt (N,), n_matches, n_map_inliers).
    """
    obs_k = m.kf_obs_pt[kf]
    has_k = (obs_k >= 0) & m.kf_kp_valid[kf] & m.pt_valid[jnp.maximum(obs_k, 0)]
    pair = cur.valid[:, None] & has_k[None, :]
    idx, dist, ok = match_nn_ratio(
        cur.desc, m.kf_kp_desc[kf], pair, max_dist=TH_LOW, nn_ratio=0.7
    )
    ok = rotation_consistency_mask(cur.angle, m.kf_kp_angle[kf][idx], ok)
    ok = resolve_duplicates(idx, dist, ok, m.kf_kp_desc.shape[1])
    n_matches = jnp.sum(ok)
    obs_pt = jnp.where(ok, obs_k[idx], -1)
    R, t, obs_pt2, n_inl = _optimize_frame_pose(
        cam, m, cur, obs_pt, R0, t0, inv_sigma2_table
    )
    return R, t, obs_pt2, n_matches, n_inl


@partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels", "window", "max_desc_dist"))
def reloc_search_by_projection(
    cam: PinholeCamera,
    m: MapState,
    kf: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    cur: FrameFeatures,
    obs_pt: jnp.ndarray,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    window: float = 10.0,
    max_desc_dist: int = 100,
):
    """Relocalization projective widening (ORBmatcher::SearchByProjection
    reloc variant, /root/reference/src/ORBmatcher.cc:1540, driven by
    Tracking::Relocalization:1499-1533): project the candidate keyframe's
    map points with the current pose estimate and match into still-free
    keypoints, excluding points already found. Returns (obs_pt, n_added).
    """
    obs_k = m.kf_obs_pt[kf]
    pt_idx = jnp.maximum(obs_k, 0)
    has_k = (obs_k >= 0) & m.kf_kp_valid[kf] & m.pt_valid[pt_idx]
    # Seen-set exclusion (sFound): skip points already assigned this frame.
    P = m.capacity_pt
    already = jnp.zeros((P,), bool).at[jnp.maximum(obs_pt, 0)].set(obs_pt >= 0)
    cand = has_k & ~already[pt_idx]

    Xw = m.pt_xyz[pt_idx]
    p_cam = se3_apply(R, t, Xw)
    uv = project(cam, p_cam)
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < cam.width) & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    )
    C = -(R.T @ t)
    dist_w = jnp.linalg.norm(Xw - C, axis=-1)
    in_range = (dist_w >= m.pt_min_dist[pt_idx]) & (dist_w <= m.pt_max_dist[pt_idx])
    cand = cand & (p_cam[:, 2] > 0.05) & in_img & in_range

    pred_lvl = predict_scale(dist_w, m.pt_max_dist[pt_idx], scale_factor, n_levels)
    radius = window * scale_factor ** pred_lvl.astype(jnp.float32)
    kp_taken = obs_pt >= 0
    idx, d, ok = search_by_projection_points(
        uv,
        m.pt_desc[pt_idx],
        cand,
        radius,
        jnp.maximum(pred_lvl - 1, 0),
        pred_lvl + 1,
        cur.xy,
        cur.desc,
        cur.level,
        cur.angle,
        cur.valid & ~kp_taken,
        max_dist=max_desc_dist,
        nn_ratio=0.0,
    )
    # Row e of the search is the candidate point held by KF keypoint e; its
    # matched frame keypoint is idx[e].
    new_obs = obs_pt.at[idx].set(
        jnp.where(ok & (obs_pt[idx] < 0), obs_k, obs_pt[idx])
    )
    n_added = jnp.sum(new_obs >= 0) - jnp.sum(obs_pt >= 0)
    return new_obs, n_added


@partial(jax.jit, static_argnames=("cam",))
def optimize_frame_pose(cam, m, cur, obs_pt, R0, t0, inv_sigma2_table):
    """Standalone pose optimization from an observation assignment (the
    Optimizer::PoseOptimization calls scattered through Tracking::
    Relocalization, /root/reference/src/Tracking.cc:1493-1533). Returns
    (R, t, obs_pt, n_inliers)."""
    return _optimize_frame_pose(cam, m, cur, obs_pt, R0, t0, inv_sigma2_table)


@jax.jit
def tracked_map_points(m: MapState, kf: jnp.ndarray, min_obs: jnp.ndarray):
    """KeyFrame::TrackedMapPoints (/root/reference/src/KeyFrame.cc:250):
    number of the keyframe's observed map points with >= min_obs total
    observations."""
    P = m.capacity_pt
    has = (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    flat = jnp.where(has, m.kf_obs_pt, P).reshape(-1)
    cnt = jnp.zeros((P + 1,)).at[flat].add(1.0)[:P]
    obs_k = m.kf_obs_pt[kf]
    ok = (
        (obs_k >= 0)
        & m.kf_kp_valid[kf]
        & m.pt_valid[jnp.maximum(obs_k, 0)]
        & (cnt[jnp.maximum(obs_k, 0)] >= min_obs)
    )
    return jnp.sum(ok)


@partial(jax.jit, static_argnames=("depth",))
def keyframe_gates(
    m: MapState,
    ref_kf: jnp.ndarray,
    feats: FrameFeatures,
    obs_pt: jnp.ndarray,
    th_depth: jnp.ndarray,
    depth: bool = False,
):
    """All scalar inputs of Tracking::NeedNewKeyFrame (/root/reference/src/
    Tracking.cc:1029-1070) packed into ONE (4,) device array so the host
    pays a single device->host transfer per frame: [n_valid_kf,
    ref_kf_tracked_matches, tracked_close, untracked_close]. min_obs for
    the reference-matches count follows nKFs<=2 ? 2 : 3 (Tracking.cc:1049).
    """
    n_kf = jnp.sum(m.kf_valid.astype(jnp.float32))
    min_obs = jnp.where(n_kf <= 2, 2.0, 3.0)
    ref_matches = tracked_map_points(m, ref_kf, min_obs).astype(jnp.float32)
    if depth:
        close = (feats.depth > 0) & (feats.depth < th_depth) & feats.valid
        tracked_close = jnp.sum((close & (obs_pt >= 0)).astype(jnp.float32))
        untracked_close = jnp.sum((close & (obs_pt < 0)).astype(jnp.float32))
    else:
        tracked_close = jnp.float32(0.0)
        untracked_close = jnp.float32(0.0)
    return jnp.stack([n_kf, ref_matches, tracked_close, untracked_close])


def _optimize_frame_pose(cam, m, cur, obs_pt, R0, t0, inv_sigma2_table):
    """Pose-optimize the current frame from its obs_pt assignment; drop
    outlier assignments (Tracking.cc:950-980 semantics)."""
    has = (obs_pt >= 0) & cur.valid
    X = m.pt_xyz[jnp.maximum(obs_pt, 0)]
    uvr = jnp.concatenate([cur.xy, cur.u_right[:, None]], axis=-1)
    inv_s2 = inv_sigma2_table[jnp.clip(cur.level, 0, inv_sigma2_table.shape[0] - 1)]
    obs = PoseObs(pts_w=X, uvr=uvr, inv_sigma2=inv_s2, valid=has)
    R, t, inliers, n_inl = pose_optimization(cam, R0, t0, obs)
    obs_pt = jnp.where(inliers, obs_pt, -1)
    return R, t, obs_pt, n_inl


@partial(
    jax.jit,
    static_argnames=(
        "cam", "scale_factor", "n_levels", "th", "max_local_pts", "cand_cap"
    ),
)
def track_local_map(
    cam: PinholeCamera,
    m: MapState,
    R: jnp.ndarray,
    t: jnp.ndarray,
    cur: FrameFeatures,
    obs_pt: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    th: float = 1.0,
    local_kf_mask: jnp.ndarray | None = None,
    max_local_pts: int = 0,
    cand_cap: int = 0,
):
    """TrackLocalMap (/root/reference/src/Tracking.cc:982): project the
    local map points through the frustum filter (Frame::isInFrustum,
    Frame.cc:342), search unmatched ones into the current frame,
    re-optimize the pose.

    Two candidate regimes:

    - default (small maps): ALL valid points pass the vectorized
      frustum+scale gates in one pass — the reference's covisibility-local
      restriction (<= 80 KFs, Tracking.cc:1283-1337) is unnecessary at
      these capacities (documented deviation; same accepted matches).
    - `local_kf_mask` + `max_local_pts` (large maps): candidates are the
      up-to-max_local_pts valid points observed by the masked keyframes
      (the reference's mvpLocalMapPoints from mvpLocalKeyFrames,
      Tracking.cc:1257-1280), gathered into a fixed-size block so the
      matching cost is O(max_local_pts · N) instead of O(P · N) — the
      form that keeps per-frame cost flat as the map grows to KITTI-00
      scale.

    `cand_cap` > 0 additionally compacts the frustum-surviving candidates
    into a block of that size before descriptor matching (newest-first on
    overflow), so the O(cands · N) Hamming matrix covers only points that
    can actually match — the typical visible set is far smaller than the
    local point set.

    Returns (R, t, obs_pt, n_inliers, visible_mask, found_mask); the masks
    are global (P,) for the found/visible bookkeeping.
    """
    return _track_local_map_core(
        cam, m, R, t, cur, obs_pt, inv_sigma2_table, scale_factor,
        n_levels, th, local_kf_mask, max_local_pts, cand_cap,
    )


def _track_local_map_core(
    cam: PinholeCamera,
    m: MapState,
    R: jnp.ndarray,
    t: jnp.ndarray,
    cur: FrameFeatures,
    obs_pt: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    th: float = 1.0,
    local_kf_mask: jnp.ndarray | None = None,
    max_local_pts: int = 0,
    cand_cap: int = 0,
):
    P = m.capacity_pt
    subset = local_kf_mask is not None and 0 < max_local_pts < P
    if subset:
        L = max_local_pts
        has = (
            (m.kf_obs_pt >= 0)
            & m.kf_kp_valid
            & m.kf_valid[:, None]
            & local_kf_mask[:, None]
        )
        ptl = jnp.where(has, m.kf_obs_pt, P)
        mark = (
            jnp.zeros((P + 1,), bool).at[ptl.reshape(-1)].set(True)[:P]
            & m.pt_valid
        )
        # Newest-first: point slots are allocated monotonically, so when the
        # candidate set overflows the cap the HIGHEST ids are the points the
        # current frame most likely observes (the freshly triangulated local
        # structure). nonzero on the reversed mark yields descending ids;
        # re-sort ascending so downstream tie-breaking (duplicate
        # resolution) matches the dense path's id order exactly.
        sel_rev = jnp.nonzero(mark[::-1], size=L, fill_value=P + 1)[0]
        sel = jnp.sort((P - 1 - sel_rev).astype(jnp.int32))  # fill -> -2 first
        live = sel >= 0
        ids = jnp.maximum(sel, 0)
    else:
        ids = jnp.arange(P, dtype=jnp.int32)
        live = m.pt_valid

    xyz = m.pt_xyz[ids]
    p_cam = se3_apply(R, t, xyz)
    uv = project(cam, p_cam)
    z = p_cam[:, 2]
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < cam.width) & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    )
    C = -(R.T @ t)
    vec = xyz - C
    dist = jnp.linalg.norm(vec, axis=-1)
    in_range = (dist >= m.pt_min_dist[ids]) & (dist <= m.pt_max_dist[ids])
    normal = m.pt_normal[ids]
    view_cos = jnp.sum(vec * normal, axis=-1) / jnp.maximum(
        dist * jnp.linalg.norm(normal, axis=-1), 1e-9
    )
    good_view = view_cos > 0.5  # isInFrustum viewingCosLimit (Tracking.cc:1219)
    visible = live & (z > 0.05) & in_img & in_range & good_view

    # Exclude points already matched this frame.
    already = jnp.zeros((P,), bool).at[jnp.maximum(obs_pt, 0)].set(obs_pt >= 0)
    cand = visible & ~already[ids]

    pred_lvl = predict_scale(dist, m.pt_max_dist[ids], scale_factor, n_levels)
    radius = jnp.where(view_cos > 0.998, 2.5, 4.0) * th * scale_factor ** pred_lvl.astype(
        jnp.float32
    )

    # Candidate compaction: only the frustum survivors reach the Hamming
    # matrix. Newest-first on overflow (freshly triangulated local
    # structure), re-sorted ascending so duplicate resolution keeps the
    # dense path's id-order tie-breaking.
    L0 = ids.shape[0]
    if 0 < cand_cap < L0:
        sel_rev = jnp.nonzero(cand[::-1], size=cand_cap, fill_value=L0)[0]
        pos = jnp.sort(L0 - 1 - sel_rev)  # fill -> -1 first
        c_live = pos >= 0
        j = jnp.maximum(pos, 0)
        c_ids = ids[j]
        c_uv, c_radius = uv[j], radius[j]
        c_lvl = pred_lvl[j]
        c_cand = cand[j] & c_live
    else:
        c_ids, c_uv, c_radius, c_lvl, c_cand = ids, uv, radius, pred_lvl, cand

    # Keypoints already assigned must not be re-matched.
    kp_taken = obs_pt >= 0
    idx, dmin, ok = search_by_projection_points(
        c_uv,
        m.pt_desc[c_ids],
        c_cand,
        c_radius,
        jnp.maximum(c_lvl - 1, 0),
        c_lvl + 1,
        cur.xy,
        cur.desc,
        cur.level,
        cur.angle,
        cur.valid & ~kp_taken,
        max_dist=TH_HIGH,
        nn_ratio=0.8,
        ratio_same_level_only=True,
    )
    obs_pt = obs_pt.at[idx].set(
        jnp.where(ok & (obs_pt[idx] < 0), c_ids, obs_pt[idx])
    )

    R, t, obs_pt, n_inl = _optimize_frame_pose(
        cam, m, cur, obs_pt, R, t, inv_sigma2_table
    )

    # found/visible bookkeeping (MapPoint::IncreaseVisible/Found), scattered
    # back to global point ids.
    visible_g = (
        jnp.zeros((P + 1,), bool)
        .at[jnp.where(visible, ids, P)]
        .set(True)[:P]
    )
    found = jnp.zeros((P,), bool).at[jnp.maximum(obs_pt, 0)].set(obs_pt >= 0)
    return R, t, obs_pt, n_inl, visible_g, found


@partial(jax.jit, static_argnames=("max_kfs",))
def local_keyframe_mask(
    m: MapState, obs_pt: jnp.ndarray, max_kfs: int = 80, ref_kf=None
) -> jnp.ndarray:
    """UpdateLocalKeyFrames (/root/reference/src/Tracking.cc:1283-1337):
    keyframes observing the current frame's matched points, capped at the
    `max_kfs` best voters (the reference's 80-KF cap). The reference also
    adds each voter's covisibility neighbors / spanning-tree relatives;
    here the vote cap plus the best voter's covisible set (via
    shared_point_counts) covers that intent in two vectorized passes
    (documented deviation).

    With zero matched points (e.g. a localization-mode VO frame) there is
    no vote, so `ref_kf` (the last reference keyframe) seeds the local map
    instead of argmax(0)=slot 0 producing an arbitrary neighborhood.

    Returns a (K,) bool mask over keyframe slots.
    """
    K = m.kf_obs_pt.shape[0]
    P = m.capacity_pt
    matched = jnp.zeros((P + 1,), bool).at[
        jnp.where(obs_pt >= 0, obs_pt, P)
    ].set(True).at[P].set(False)
    has = (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    pt = jnp.where(has, m.kf_obs_pt, P)
    votes = jnp.sum(has & matched[pt], axis=1)  # keyframeCounter
    if ref_kf is not None:
        votes = jnp.where(
            jnp.any(votes > 0), votes, votes.at[jnp.maximum(ref_kf, 0)].add(1)
        )
    top = jnp.argsort(-votes)[:max_kfs]
    mask = jnp.zeros((K,), bool).at[top].set(votes[top] > 0)
    # Neighbors of the best voter (GetBestCovisibilityKeyFrames(10) spirit);
    # only expand when somebody actually voted.
    best = jnp.argmax(votes)
    shared = shared_point_counts(m, best)
    nb = jnp.argsort(-shared)[:10]
    mask = mask.at[nb].set(mask[nb] | ((shared[nb] >= 15.0) & (votes[best] > 0)))
    return mask & m.kf_valid


@partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels"))
def triangulate_new_points(
    cam: PinholeCamera,
    m: MapState,
    kf_new: jnp.ndarray,
    kf_old: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
    scale_factor: float = 1.2,
    n_levels: int = 8,
):
    """LocalMapping::CreateNewMapPoints between one KF pair
    (/root/reference/src/LocalMapping.cc:207): epipolar-constrained matching
    of unmatched keypoints (ORBmatcher::SearchForTriangulation,
    ORBmatcher.cc:725), two-view triangulation, cheirality / parallax /
    reprojection / scale-consistency vetting.

    Returns (xyz (N, 3), desc, normals, min_d, max_d, slot_new (N,),
    slot_old (N,), good (N,)) — candidate points, one per NEW-KF keypoint,
    to be inserted by the caller.
    """
    N = m.kf_kp_xy.shape[1]
    R1, t1 = m.kf_R[kf_old], m.kf_t[kf_old]
    R2, t2 = m.kf_R[kf_new], m.kf_t[kf_new]

    # Baseline gate (LocalMapping.cc:244-261, mono): skip the pair entirely
    # when the baseline is below 1% of the new KF's median scene depth —
    # near-zero-baseline triangulations are pure noise and poison the map.
    C1 = -(R1.T @ t1)
    C2g = -(R2.T @ t2)
    baseline = jnp.linalg.norm(C2g - C1)
    obs_new = m.kf_obs_pt[kf_new]
    obs_ok = (obs_new >= 0) & m.kf_kp_valid[kf_new]
    pc = se3_apply(R2, t2, m.pt_xyz[jnp.maximum(obs_new, 0)])
    depths = jnp.where(obs_ok, pc[:, 2], jnp.nan)
    med_depth = jnp.nanmedian(depths)
    med_depth = jnp.where(jnp.isnan(med_depth), 1.0, med_depth)
    pair_ok = baseline > 0.01 * med_depth

    free1 = m.kf_kp_valid[kf_old] & (m.kf_obs_pt[kf_old] < 0) & pair_ok
    free2 = m.kf_kp_valid[kf_new] & (m.kf_obs_pt[kf_new] < 0) & pair_ok

    # Fundamental matrix F12 relating old (1) to new (2).
    R12 = R1 @ R2.T
    t12 = t1 - (R12 @ t2[:, None])[:, 0]
    tx = jnp.array(
        [
            [0.0, -t12[2], t12[1]],
            [t12[2], 0.0, -t12[0]],
            [-t12[1], t12[0], 0.0],
        ]
    )
    Kinv = jnp.linalg.inv(cam.K)
    F12 = Kinv.T @ tx @ R12 @ Kinv

    xy1 = m.kf_kp_xy[kf_old]
    xy2 = m.kf_kp_xy[kf_new]
    x1h = jnp.concatenate([xy1, jnp.ones((N, 1))], axis=-1)
    x2h = jnp.concatenate([xy2, jnp.ones((N, 1))], axis=-1)
    # Epipolar line of kp1 in image 2: l2 = F12^T x1 (x1 in image 1).
    l2 = x1h @ F12  # (N, 3)
    num = jnp.abs(jnp.sum(l2[:, None, :] * x2h[None, :, :], axis=-1))  # (N1, N2)
    den = jnp.sqrt(jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12))[:, None]
    epi_d2 = (num / den) ** 2
    sigma2_2 = 1.0 / inv_sigma2_table[jnp.clip(m.kf_kp_level[kf_new], 0, n_levels - 1)]
    epi_ok = epi_d2 < 3.84 * sigma2_2[None, :]

    pair = free1[:, None] & free2[None, :] & epi_ok
    dist = jnp.where(
        pair, hamming_matrix(m.kf_kp_desc[kf_old], m.kf_kp_desc[kf_new]), _BIG
    )
    d1 = jnp.min(dist, axis=0)  # best OLD kp for each NEW kp
    i1 = jnp.argmin(dist, axis=0)
    matched = d1 <= TH_LOW
    matched = rotation_consistency_mask(
        m.kf_kp_angle[kf_old][i1], m.kf_kp_angle[kf_new], matched
    )
    matched = resolve_duplicates(i1, d1, matched, N)

    uv1m = xy1[i1]
    uv2m = xy2
    Xw, w = triangulate_two_view(
        jnp.broadcast_to(R1, (N, 3, 3)),
        jnp.broadcast_to(t1, (N, 3)),
        jnp.broadcast_to(R2, (N, 3, 3)),
        jnp.broadcast_to(t2, (N, 3)),
        cam.K,
        uv1m,
        uv2m,
    )
    finite = jnp.all(jnp.isfinite(Xw), axis=-1) & (jnp.abs(w) > 1e-9)

    # Parallax gate (LocalMapping.cc:299-316): require > ~1.1 deg.
    C1 = -(R1.T @ t1)
    C2 = -(R2.T @ t2)
    r1v = Xw - C1
    r2v = Xw - C2
    cosp = jnp.sum(r1v * r2v, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1v, axis=-1) * jnp.linalg.norm(r2v, axis=-1), 1e-12
    )
    parallax_ok = cosp < 0.9998

    # Cheirality + reprojection chi2 in both KFs (LocalMapping.cc:353-431).
    p1 = se3_apply(R1, t1, Xw)
    p2 = se3_apply(R2, t2, Xw)
    uv1p = project(cam, p1)
    uv2p = project(cam, p2)
    s2_1 = 1.0 / inv_sigma2_table[jnp.clip(m.kf_kp_level[kf_old][i1], 0, n_levels - 1)]
    s2_2v = 1.0 / inv_sigma2_table[jnp.clip(m.kf_kp_level[kf_new], 0, n_levels - 1)]
    e1 = jnp.sum((uv1p - uv1m) ** 2, axis=-1)
    e2 = jnp.sum((uv2p - uv2m) ** 2, axis=-1)
    reproj_ok = (e1 < 5.991 * s2_1) & (e2 < 5.991 * s2_2v)
    chei = (p1[:, 2] > 0) & (p2[:, 2] > 0)

    # Scale consistency (LocalMapping.cc:409-427).
    d1v = jnp.linalg.norm(r1v, axis=-1)
    d2v = jnp.linalg.norm(r2v, axis=-1)
    sf1 = scale_factor ** m.kf_kp_level[kf_old][i1].astype(jnp.float32)
    sf2 = scale_factor ** m.kf_kp_level[kf_new].astype(jnp.float32)
    ratio_d = d1v / jnp.maximum(d2v, 1e-9)
    ratio_o = sf1 / sf2
    ratio_factor = 1.5 * scale_factor
    scale_ok = (ratio_d < ratio_o * ratio_factor) & (ratio_d > ratio_o / ratio_factor)

    good = matched & finite & parallax_ok & chei & reproj_ok & scale_ok

    # Point attributes: normal from the new KF's view, scale range from its
    # octave (MapPoint ctor + UpdateNormalAndDepth).
    nvec = r2v / jnp.maximum(jnp.linalg.norm(r2v, axis=-1, keepdims=True), 1e-9)
    max_d = d2v * sf2
    min_d = max_d / (scale_factor ** (n_levels - 1))
    return (
        Xw,
        m.kf_kp_desc[kf_new],
        nvec,
        0.8 * min_d,
        1.2 * max_d,
        jnp.arange(N, dtype=jnp.int32),
        i1,
        good,
    )


def build_local_ba_problem(
    m: MapState,
    center_kf: jnp.ndarray,
    window: int,
    max_edges: int,
):
    """Assemble a BAProblem over the center KF's covisibility neighborhood.

    The reference optimizes the covisibility neighborhood of the newest KF
    with all other observers fixed (Optimizer::LocalBundleAdjustment,
    /root/reference/src/Optimizer.cc:453-504). Active set: the center KF and
    every keyframe sharing >= 15 map points with it (KeyFrame::
    UpdateConnections threshold); when no keyframe clears the threshold
    (sparse early map) the `window` most recent keyframes are used instead.
    Fixed set: every other valid KF (boundary) + KF 0 (gauge).
    """
    K, N = m.kf_obs_pt.shape
    idx = jnp.arange(K)
    # Recency by FRAME ID, not slot index: once capacity is reached new
    # keyframes recycle culled slots, so slot order no longer follows time.
    fid = m.kf_frame_id
    eligible = m.kf_valid & (fid <= fid[center_kf])
    newer = eligible[None, :] & (fid[None, :] > fid[:, None])
    recency = eligible & (jnp.sum(newer, axis=1) < window)
    shared = shared_point_counts(m, center_kf)  # row of the covis matrix
    covis = m.kf_valid & (shared >= 15.0) & (idx != center_kf)
    active = jnp.where(
        jnp.any(covis), covis | (m.kf_valid & (idx == center_kf)), recency
    )
    fixed_kf = m.kf_valid & ~active | (jnp.arange(K) == 0)

    # Edges: all (kf, kp) slots with a point whose point is observed by an
    # active KF. For capacity reasons take ALL observations of valid KFs;
    # edges of fixed KFs observing non-active points are pruned by validity.
    kfi = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    pti = m.kf_obs_pt.reshape(-1)
    has = (pti >= 0) & m.kf_kp_valid.reshape(-1) & m.kf_valid[kfi]
    uvr = jnp.concatenate(
        [m.kf_kp_xy.reshape(K * N, 2), m.kf_kp_uright.reshape(K * N, 1)], axis=-1
    )
    # Points adjustable only if seen by an active KF.
    P = m.capacity_pt
    seen_active = jnp.zeros((P + 1,), bool).at[
        jnp.where(has & active[kfi], pti, P)
    ].set(True)[:P]
    fixed_pt = ~seen_active
    return kfi, jnp.maximum(pti, 0), uvr, has, fixed_kf, fixed_pt


@partial(
    jax.jit,
    static_argnames=("cam", "window", "iters", "n_levels", "max_edges",
                     "active_max"),
)
def local_bundle_adjustment(
    cam: PinholeCamera,
    m: MapState,
    center_kf: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
    window: int = 8,
    iters: int = 8,
    n_levels: int = 8,
    max_edges: int = 65536,
    active_max: int = 32,
):
    """Local BA over the center KF's covisibility neighborhood; writes
    optimized poses/points back into the map and invalidates outlier
    observations (Optimizer.cc:659-757).

    The solver runs on a COMPACTED edge set: of the (K, N) possible
    observation slots only edges that can influence the solution — an end
    is non-fixed, exactly g2o's active graph (Optimizer.cc:455-504) — are
    gathered into a `max_edges` block (active-KF edges kept first on
    overflow). The full (K, N) problem wasted >10x the FLOPs on
    fixed-fixed edges at KITTI-scale capacities.

    The adjustable keyframes are further rank-compacted (most-covisible
    first, center always kept) into a static `active_max` window and the
    reduced camera system is solved DENSELY
    (optim.ba.dense_schur_bundle_adjustment) — the scatter-heavy CG path
    cost ~750 ms per chunk on a v5e; the dense path is ~25x cheaper and
    exact, matching g2o's Cholesky-on-reduced-system strategy.

    Returns the updated MapState.
    """
    K, N = m.kf_obs_pt.shape
    kfi, pti, uvr, has, fixed_kf, fixed_pt = build_local_ba_problem(
        m, center_kf, window, 0
    )
    # Rank-compact adjustable KFs into `active_max` static slots: center
    # first, then by shared-point count with the center (the covisibility
    # ordering of Optimizer.cc:455-468); overflow becomes fixed boundary.
    adjustable = m.kf_valid & ~fixed_kf
    shared = shared_point_counts(m, center_kf)
    score = jnp.where(adjustable, shared + 1.0, -1.0)
    score = score.at[center_kf].set(jnp.inf)
    a = min(active_max, K)
    vals, idx = jax.lax.top_k(score, a)
    active_idx = jnp.where(vals > 0, idx.astype(jnp.int32), -1)
    # KFs that were adjustable but fell off the active window are fixed.
    in_active = jnp.zeros((K + 1,), bool).at[
        jnp.where(active_idx >= 0, active_idx, K)
    ].set(True)[:K]
    fixed_kf = fixed_kf | (adjustable & ~in_active)

    inv_s2 = inv_sigma2_table[
        jnp.clip(m.kf_kp_level.reshape(-1), 0, inv_sigma2_table.shape[0] - 1)
    ]
    valid_e = has & m.pt_valid[pti]
    E = K * N
    cap = min(max_edges, E) if max_edges else E
    if cap < E:
        # An edge matters iff at least one end is adjustable; keep
        # active-KF edges over boundary edges on overflow (stable sort
        # preserves slot order within each class).
        useful = valid_e & (~fixed_kf[kfi] | ~fixed_pt[pti])
        prio = useful.astype(jnp.int32) * (
            1 + (~fixed_kf[kfi]).astype(jnp.int32)
        )
        sel = jnp.argsort(-prio, stable=True)[:cap]
        e_live = prio[sel] > 0
        kfi_c, pti_c = kfi[sel], pti[sel]
        prob = BAProblem(
            R=m.kf_R, t=m.kf_t, X=m.pt_xyz,
            kf=kfi_c, pt=pti_c, uvr=uvr[sel], inv_sigma2=inv_s2[sel],
            valid=valid_e[sel] & e_live,
            fixed_kf=fixed_kf, fixed_pt=fixed_pt,
        )
        R, t, X, chi2 = dense_schur_bundle_adjustment(
            cam, prob, active_idx, iters=iters, use_huber=True
        )
        stereo_e = prob.uvr[:, 2] >= 0
        th = jnp.where(stereo_e, 7.815, 5.991)
        bad = prob.valid & (chi2 > th)
        obs = m.kf_obs_pt.reshape(-1)
        obs = obs.at[sel].set(jnp.where(bad, -1, obs[sel]))
        return m._replace(kf_R=R, kf_t=t, pt_xyz=X, kf_obs_pt=obs.reshape(K, N))
    prob = BAProblem(
        R=m.kf_R,
        t=m.kf_t,
        X=m.pt_xyz,
        kf=kfi,
        pt=pti,
        uvr=uvr,
        inv_sigma2=inv_s2,
        valid=valid_e,
        fixed_kf=fixed_kf,
        fixed_pt=fixed_pt,
    )
    R, t, X, chi2 = dense_schur_bundle_adjustment(
        cam, prob, active_idx, iters=iters, use_huber=True
    )
    # Outlier pruning: observations with chi2 beyond the threshold are
    # detached (mono 5.991 / stereo 7.815, Optimizer.cc:705-720).
    stereo_e = uvr[:, 2] >= 0
    th = jnp.where(stereo_e, 7.815, 5.991)
    bad = prob.valid & (chi2 > th)
    obs = m.kf_obs_pt.reshape(-1)
    obs = jnp.where(bad, -1, obs)
    return m._replace(kf_R=R, kf_t=t, pt_xyz=X, kf_obs_pt=obs.reshape(K, N))


@jax.jit
def cull_map_points(m: MapState, current_kf: jnp.ndarray, min_kf_obs: float = 3.0):
    """MapPointCulling (/root/reference/src/LocalMapping.cc:170): invalidate
    points whose tracked/visible ratio is below 0.25, or that are not yet
    observed by enough keyframes two keyframes after creation. Culled points
    are detached from every observation slot.

    min_kf_obs: keyframe-observation survival threshold, in KF counts. The
    reference culls at Observations() <= cnThObs with cnThObs = 2 (mono) /
    3 (stereo+RGB-D) where a stereo observation counts 2 (MapPoint.cc:98) —
    i.e. a mono point must reach 3 distinct keyframes, a stereo point 2.
    Two-view-only mono triangulations are near the parallax threshold and
    systematically biased; keeping them poisons local BA at sparse keyframe
    cadence.
    """
    P = m.capacity_pt
    ratio = m.pt_found / jnp.maximum(m.pt_visible, 1.0)
    # Observation counts per point.
    has = (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    flat = jnp.where(has, m.kf_obs_pt, P).reshape(-1)
    cnt = jnp.zeros((P + 1,)).at[flat].add(1.0)[:P]
    age = current_kf - m.pt_first_kf  # in keyframes
    bad = m.pt_valid & (
        ((ratio < 0.25) & (m.pt_visible >= 4.0))
        | ((age >= 2) & (cnt < min_kf_obs))
    )
    obs = m.kf_obs_pt
    obs_bad = bad[jnp.maximum(obs, 0)] & (obs >= 0)
    return m._replace(
        pt_valid=m.pt_valid & ~bad,
        kf_obs_pt=jnp.where(obs_bad, -1, obs),
    )


@partial(jax.jit, static_argnames=("config", "fx", "bf"))
def stereo_frame_features(
    imgL: jnp.ndarray,
    imgR: jnp.ndarray,
    config,
    fx: float,
    bf: float,
):
    """Stereo Frame construction (/root/reference/src/Frame.cc:74): ORB on
    both images (the reference uses two threads, Frame.cc:94-103 — here one
    program; XLA schedules both extractions), then row-banded stereo
    matching with SAD subpixel refinement. Returns (feats_left FrameFeatures
    with u_right/depth filled)."""
    from tpuslam.mapstate.core import FrameFeatures
    from tpuslam.ops.image import build_pyramid
    from tpuslam.ops.orb import ORBFeatures, extract_orb_batched
    from tpuslam.ops.stereo import stereo_match

    # Both images as one extraction batch: shared FAST kernel launch, one
    # patch-gather DMA stream, one BRIEF matmul set (the TPU form of the
    # reference's two extraction threads, Frame.cc:94-103).
    fLR = extract_orb_batched(jnp.stack([imgL, imgR]), config)
    fL = ORBFeatures(*(leaf[0] for leaf in fLR))
    fR = ORBFeatures(*(leaf[1] for leaf in fLR))
    pyrL = build_pyramid(imgL, config.n_levels, config.scale_factor)
    pyrR = build_pyramid(imgR, config.n_levels, config.scale_factor)
    u_right, depth, ok = stereo_match(fL, fR, pyrL, pyrR, config, fx, bf)
    n = fL.xy.shape[0]
    return FrameFeatures(
        xy=fL.xy,
        level=fL.level,
        angle=fL.angle,
        desc=fL.desc,
        valid=fL.valid,
        u_right=jnp.where(ok, u_right, -1.0),
        depth=jnp.where(ok, depth, 0.0),
    )


@partial(jax.jit, static_argnames=("cam", "scale_factor", "n_levels"))
def _fuse_pair_match(
    cam: PinholeCamera,
    m: MapState,
    cnt: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    enabled=True,
):
    """Match phase of SearchInNeighbors / ORBmatcher::Fuse for one directed
    KF pair (/root/reference/src/LocalMapping.cc:454, ORBmatcher.cc:893):
    project src's map points into dst and match against dst's keypoints.
    Pure read — the merge/add application is batched across all pairs by
    the caller (mapping_front), which lets the pair dimension vmap.

    cnt: (P,) per-point observation counts (merge arbitration), computed
    once by the caller. Returns per-src-slot arrays
    (tgt_slot, add, merge, winner, loser), each (N,).
    """
    obs_a = m.kf_obs_pt[src]
    has_a = (obs_a >= 0) & m.kf_kp_valid[src] & m.pt_valid[jnp.maximum(obs_a, 0)]
    pts = m.pt_xyz[jnp.maximum(obs_a, 0)]

    R, t = m.kf_R[dst], m.kf_t[dst]
    p_cam = se3_apply(R, t, pts)
    uv = project(cam, p_cam)
    in_img = (
        (uv[:, 0] >= 0) & (uv[:, 0] < cam.width) & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    )
    C = -(R.T @ t)
    dist = jnp.linalg.norm(pts - C, axis=-1)
    proj_ok = has_a & (p_cam[:, 2] > 0.05) & in_img

    pred_lvl = predict_scale(
        dist, m.pt_max_dist[jnp.maximum(obs_a, 0)], scale_factor, n_levels
    )
    radius = 3.0 * scale_factor ** pred_lvl.astype(jnp.float32)

    idx, d, ok = search_by_projection_points(
        uv,
        m.pt_desc[jnp.maximum(obs_a, 0)],
        proj_ok,
        radius,
        jnp.maximum(pred_lvl - 1, 0),
        pred_lvl + 1,
        m.kf_kp_xy[dst],
        m.kf_kp_desc[dst],
        m.kf_kp_level[dst],
        m.kf_kp_angle[dst],
        m.kf_kp_valid[dst],
        max_dist=TH_LOW,
        nn_ratio=0.0,
    )
    p_src = jnp.maximum(obs_a, 0)          # point carried by each src slot
    tgt_slot = idx                          # matched dst keypoint slot
    q = m.kf_obs_pt[dst][tgt_slot]          # existing point there (-1 free)
    ok = ok & (q != p_src) & enabled

    merge = ok & (q >= 0) & m.pt_valid[jnp.maximum(q, 0)]
    add = ok & ~merge

    qs = jnp.maximum(q, 0)
    # Strict arbitration order (count, then index) keeps the batched merge
    # graph acyclic: every loser has a strictly smaller key than its winner,
    # so pointer jumping terminates (MapPoint::Replace keeps the
    # more-observed point, MapPoint.cc:177; the index tiebreak is ours).
    keep_src = (cnt[p_src] > cnt[qs]) | (
        (cnt[p_src] == cnt[qs]) & (p_src <= qs)
    )
    winner = jnp.where(keep_src, p_src, qs)
    loser = jnp.where(keep_src, qs, p_src)
    return tgt_slot, add, merge, winner, loser


# --------------------------------------------------------------------------
# Fused steady-state frame step: the whole Tracking::Track OK path
# (/root/reference/src/Tracking.cc:285-528) as ONE jitted program.
# --------------------------------------------------------------------------

# Packed scalar layout returned by fused_track_frame (see _fused_pack):
FUSED_ACCEPT = 0      # 1.0 when the frame is accepted (initial ok + TLM >= thr)
FUSED_INITIAL_OK = 1  # initial pose estimate succeeded
FUSED_USED_MM = 2     # initial estimate came from the motion model
FUSED_N_TRACKED = 3   # TrackLocalMap inlier count
FUSED_GATES = 4       # 4 scalars: keyframe_gates pack
FUSED_REL = 8         # 12: rel pose vs ref KF (R row-major 9 + t 3)
FUSED_POSE = 20       # 12: absolute T_cw (R row-major 9 + t 3)
FUSED_NM = 32         # raw motion-model match count (diagnostics)
FUSED_LEN = 33


def _fused_track_core(
    cam: PinholeCamera,
    m: MapState,
    last_feats: FrameFeatures,
    last_obs: jnp.ndarray,
    last_R: jnp.ndarray,
    last_t: jnp.ndarray,
    vel_R: jnp.ndarray,
    vel_t: jnp.ndarray,
    has_vel: jnp.ndarray,
    feats: FrameFeatures,
    ref_kf: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
    th_depth: jnp.ndarray,
    accept_thr: jnp.ndarray,
    scale_factor: float,
    n_levels: int,
    min_inliers_motion: int,
    depth: bool,
    max_local_pts: int,
    cand_cap: int,
):
    """One-program steady-state tracking step (the reference's whole
    Tracking::Track OK path, Tracking.cc:327-528):

      motion-model track (th=7, in-graph th=14 retry, Tracking.cc:944)
      -> ref-KF fallback when the motion model fails (Tracking.cc:337)
      -> TrackLocalMap (+ covisibility subset on large maps)
      -> NeedNewKeyFrame scalar gates
      -> velocity + found/visible bookkeeping + rel-pose vs ref KF,

    all fused so the host pays ONE dispatch and ONE (FUSED_LEN,) scalar
    fetch per steady-state frame instead of ~15 dispatches + several syncs
    (the round-3 e2e bottleneck on a tunneled chip).
    """
    N = feats.xy.shape[0]
    ref_c = jnp.maximum(ref_kf, 0)

    pt_idx = last_obs
    has_pt = (
        (pt_idx >= 0) & last_feats.valid & m.pt_valid[jnp.maximum(pt_idx, 0)]
    )
    Xw_last = m.pt_xyz[jnp.maximum(pt_idx, 0)]
    R_pred, t_pred = se3_compose(vel_R, vel_t, last_R, last_t)

    def mm_at(th):
        R, t, tag, _, n_map, _, n_m = track_motion_model_pts(
            cam, last_feats, Xw_last, pt_idx, has_pt, R_pred, t_pred, feats,
            inv_sigma2_table, scale_factor=scale_factor, n_levels=n_levels,
            th=th,
        )
        return R, t, jnp.where(tag >= 0, tag, -1), n_map, n_m

    def mm_branch(_):
        out7 = mm_at(7.0)
        retry = (out7[4] < 20) | (out7[3] < min_inliers_motion)
        # Wider-window retry in-graph (Tracking.cc:944: th=2x).
        return jax.lax.cond(retry, lambda __: mm_at(14.0), lambda __: out7, None)

    def mm_skip(_):
        return (
            last_R, last_t, jnp.full((N,), -1, jnp.int32),
            jnp.int32(0), jnp.int32(0),
        )

    R_mm, t_mm, obs_mm, ni_mm, nm_mm = jax.lax.cond(
        has_vel, mm_branch, mm_skip, None
    )
    mm_ok = has_vel & (nm_mm >= 20) & (ni_mm >= min_inliers_motion)

    # Reference-keyframe fallback (TrackReferenceKeyFrame, Tracking.cc:809).
    def ref_branch(_):
        R, t, obs, n_matches, n_inl = track_reference_keyframe(
            cam, m, ref_c, feats, last_R, last_t, inv_sigma2_table
        )
        return R, t, obs, (n_matches >= 15) & (n_inl >= 10)

    def ref_skip(_):
        return R_mm, t_mm, obs_mm, jnp.asarray(True)

    R0, t0, obs0, ref_ok = jax.lax.cond(mm_ok, ref_skip, ref_branch, None)
    initial_ok = mm_ok | ref_ok

    local_kf_mask = None
    if 0 < max_local_pts < m.capacity_pt:
        local_kf_mask = local_keyframe_mask(m, obs0, ref_kf=ref_c)
    R2, t2, obs2, n_inl, visible, found = _track_local_map_core(
        cam, m, R0, t0, feats, obs0, inv_sigma2_table,
        scale_factor=scale_factor, n_levels=n_levels,
        local_kf_mask=local_kf_mask, max_local_pts=max_local_pts,
        cand_cap=cand_cap,
    )

    gates = keyframe_gates(m, ref_c, feats, obs2, th_depth, depth=depth)
    accept = initial_ok & (n_inl >= accept_thr)

    # Bookkeeping, gated in-graph by acceptance.
    accf = accept.astype(jnp.float32)
    pt_visible = m.pt_visible + accf * visible.astype(jnp.float32)
    pt_found = m.pt_found + accf * found.astype(jnp.float32)
    Rl_inv, tl_inv = se3_inverse(last_R, last_t)
    vel_R2, vel_t2 = se3_compose(R2, t2, Rl_inv, tl_inv)
    rel_R, rel_t = se3_compose(
        R2, t2, *se3_inverse(m.kf_R[ref_c], m.kf_t[ref_c])
    )

    packed = jnp.concatenate([
        jnp.stack([
            accf,
            initial_ok.astype(jnp.float32),
            mm_ok.astype(jnp.float32),
            n_inl.astype(jnp.float32),
        ]),
        gates,
        rel_R.reshape(-1), rel_t,
        R2.reshape(-1), t2,
        jnp.stack([nm_mm.astype(jnp.float32)]),
    ])
    return R2, t2, obs2, vel_R2, vel_t2, pt_visible, pt_found, packed


@partial(
    jax.jit,
    static_argnames=(
        "cam", "scale_factor", "n_levels", "min_inliers_motion", "depth",
        "max_local_pts", "cand_cap",
    ),
)
def fused_track_frame(
    cam: PinholeCamera,
    m: MapState,
    last_feats: FrameFeatures,
    last_obs: jnp.ndarray,
    last_R: jnp.ndarray,
    last_t: jnp.ndarray,
    vel_R: jnp.ndarray,
    vel_t: jnp.ndarray,
    has_vel: jnp.ndarray,
    feats: FrameFeatures,
    ref_kf: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
    th_depth: jnp.ndarray,
    accept_thr: jnp.ndarray,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    min_inliers_motion: int = 10,
    depth: bool = False,
    max_local_pts: int = 0,
    cand_cap: int = 0,
):
    """Fused steady-state frame step over precomputed FrameFeatures (the
    stereo / RGB-D / multi-stream entry; see _fused_track_core)."""
    return _fused_track_core(
        cam, m, last_feats, last_obs, last_R, last_t, vel_R, vel_t, has_vel,
        feats, ref_kf, inv_sigma2_table, th_depth, accept_thr,
        scale_factor, n_levels, min_inliers_motion, depth, max_local_pts,
        cand_cap,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cam", "orb", "min_inliers_motion", "max_local_pts", "cand_cap",
    ),
)
def fused_track_frame_image(
    cam: PinholeCamera,
    orb,
    m: MapState,
    img: jnp.ndarray,
    last_feats: FrameFeatures,
    last_obs: jnp.ndarray,
    last_R: jnp.ndarray,
    last_t: jnp.ndarray,
    vel_R: jnp.ndarray,
    vel_t: jnp.ndarray,
    has_vel: jnp.ndarray,
    ref_kf: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
    accept_thr: jnp.ndarray,
    min_inliers_motion: int = 10,
    max_local_pts: int = 0,
    cand_cap: int = 0,
):
    """Monocular fused frame step FROM THE RAW IMAGE: ORB extraction +
    undistortion + the whole tracking OK path in one program — one device
    dispatch per steady-state frame (Frame construction Tracking.cc:274
    plus Track() :285 fused). Returns (feats, *fused_track_frame outputs).
    """
    from tpuslam.geometry.camera import undistort_points
    from tpuslam.ops.orb import extract_orb

    f = extract_orb(img, orb)
    xy = f.xy
    if abs(cam.k1) > 1e-12 or abs(cam.k2) > 1e-12:
        xy = undistort_points(cam, xy)
    n = xy.shape[0]
    feats = FrameFeatures(
        xy=xy, level=f.level, angle=f.angle, desc=f.desc, valid=f.valid,
        u_right=jnp.full((n,), -1.0), depth=jnp.zeros((n,)),
    )
    out = _fused_track_core(
        cam, m, last_feats, last_obs, last_R, last_t, vel_R, vel_t, has_vel,
        feats, ref_kf, inv_sigma2_table, jnp.float32(0.0), accept_thr,
        orb.scale_factor, orb.n_levels, min_inliers_motion, False,
        max_local_pts, cand_cap,
    )
    return (feats,) + out


@jax.jit
def cull_keyframes(m: MapState, current_kf: jnp.ndarray, protect: jnp.ndarray):
    """KeyFrameCulling (/root/reference/src/LocalMapping.cc:632): invalidate
    keyframes whose observed points are >= 90% redundant (seen by at least 3
    other keyframes). Poses of culled KFs are retained (frozen) so recorded
    relative trajectories still resolve; their observations are detached.

    protect: (K,) bool — KFs that must not be culled (origin, current,
    recent window).
    """
    K, N = m.kf_obs_pt.shape
    P = m.capacity_pt
    has = (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    flat = jnp.where(has, m.kf_obs_pt, P).reshape(-1)
    cnt = jnp.zeros((P + 1,)).at[flat].add(1.0)[:P + 1]
    obs_cnt = cnt[jnp.minimum(m.kf_obs_pt, P)]  # (K, N) total obs of each slot's point
    redundant = has & (obs_cnt >= 4.0)  # self + 3 others (LocalMapping.cc:693)
    n_obs = jnp.sum(has, axis=1).astype(jnp.float32)
    n_red = jnp.sum(redundant, axis=1).astype(jnp.float32)
    cull = (
        m.kf_valid
        & ~protect
        & (n_obs > 0)
        & (n_red >= 0.9 * n_obs)
    )
    # Spanning-tree reparenting (KeyFrame::SetBadFlag, KeyFrame.cc:453-545):
    # each culled KF records its most-covisible SURVIVING keyframe as parent
    # plus the relative transform T_k ∘ T_parent^-1, so trajectory exports
    # referencing it keep following later pose corrections (the reference's
    # mTcp walk, System.cc:377-381). Chains are acyclic: parents are valid
    # at their child's cull time and never point at already-culled KFs.
    survive = m.kf_valid & ~cull
    from tpuslam.mapstate.core import covisibility_weights

    # (K, K) covisibility counts without materializing the (K, P)
    # incidence (blocked above 16k points); valid-point gated like
    # KeyFrame::UpdateConnections after SetBadFlag detaches.
    shared = covisibility_weights(m)
    shared = jnp.where(survive[None, :], shared, -1.0)
    shared = shared - jnp.diag(jnp.diag(shared))
    # Fallback when no covisible survivor: the nearest-index surviving KF.
    idx = jnp.arange(K)
    nearness = -jnp.abs(idx[:, None] - idx[None, :]).astype(jnp.float32)
    nearness = jnp.where(survive[None, :] & (idx[None, :] != idx[:, None]), nearness, -jnp.inf)
    parent = jnp.where(
        jnp.max(shared, axis=1) > 0,
        jnp.argmax(shared, axis=1),
        jnp.argmax(nearness, axis=1),
    ).astype(jnp.int32)
    rel_R = m.kf_R @ jnp.swapaxes(m.kf_R[parent], -1, -2)
    rel_t = m.kf_t - jnp.einsum("kij,kj->ki", rel_R, m.kf_t[parent])
    obs = jnp.where(cull[:, None], -1, m.kf_obs_pt)
    return m._replace(
        kf_valid=survive,
        kf_obs_pt=obs,
        kf_parent=jnp.where(cull, parent, m.kf_parent),
        kf_rel_R=jnp.where(cull[:, None, None], rel_R, m.kf_rel_R),
        kf_rel_t=jnp.where(cull[:, None], rel_t, m.kf_rel_t),
    ), cull


# --------------------------------------------------------------------------
# Fused mapping front: the whole LocalMapping epoch for one new keyframe
# (triangulation vs best covisible neighbors, recent-point culling, two-hop
# bidirectional fusion, descriptor refresh, redundant-KF culling) as ONE
# jitted program — /root/reference/src/LocalMapping.cc:47-109's stage list
# with the per-neighbor C++ loops turned into lax.scan.
# --------------------------------------------------------------------------


def best_covisible_ids(m: MapState, anchor, n: int):
    """Top-n covisible keyframe ids of `anchor` (padded with -1), in-graph
    (KeyFrame::GetBestCovisibilityKeyFrames, /root/reference/src/
    KeyFrame.cc:226). Falls back to the n most recent keyframes by frame id
    when no covisibility edge exists yet (fresh map)."""
    K = m.kf_obs_pt.shape[0]
    n = min(n, K)
    shared = shared_point_counts(m, anchor)
    shared = shared.at[anchor].set(0.0)
    shared = jnp.where(m.kf_valid, shared, 0.0)
    top_val, top_idx = jax.lax.top_k(shared, n)
    covis = jnp.where(top_val > 0, top_idx.astype(jnp.int32), -1)
    fids = jnp.where(m.kf_valid, m.kf_frame_id, -1)
    fids = fids.at[anchor].set(-1)
    rv, ri = jax.lax.top_k(fids, n)
    recent = jnp.where(rv >= 0, ri.astype(jnp.int32), -1)
    return jnp.where(jnp.any(top_val > 0), covis, recent)


def dedupe_fuse_targets(ext: jnp.ndarray, K: int, nn_fuse: int) -> jnp.ndarray:
    """Dedupe the two-hop fuse-target list (the reference's seen-set,
    LocalMapping.cc:471-487) and compact direct targets first, then hop
    neighbors, into a static 2*nn_fuse block.

    `ext` is [direct targets (nn_fuse) | hop neighbors], entries in
    [0, K) or -1 for invalid. Duplicate pairs would be no-op scan steps
    that still pay full fuse cost; deduping drops the fuse scan ~3x.

    Static cost cap: the unique two-hop set can reach
    nn_fuse*(1+fuse_hop) ids in dense graphs; we keep the best 2*nn_fuse
    (direct targets prioritized over hop neighbors), an intentional
    deviation from the reference's unbounded seen-set.
    """
    # Invalid entries (-1) park at slot K so they never collide with a
    # real target id in [0, K).
    park = jnp.where(ext >= 0, ext, K)
    prio = jnp.where(ext >= 0, 1, 0).at[:nn_fuse].mul(2)
    first = (
        jnp.zeros((K + 1,), jnp.int32)
        .at[park]
        .max(jnp.arange(ext.shape[0], 0, -1, dtype=jnp.int32))
    )
    is_first = first[park] == jnp.arange(
        ext.shape[0], 0, -1, dtype=jnp.int32
    )
    prio = jnp.where(is_first, prio, 0)
    order = jnp.argsort(-prio, stable=True)[: 2 * nn_fuse]
    return jnp.where(prio[order] > 0, ext[order], -1)


@partial(
    jax.jit,
    static_argnames=(
        "cam", "scale_factor", "n_levels", "nn_tri", "nn_fuse", "fuse_hop",
        "window",
    ),
)
def mapping_front(
    cam: PinholeCamera,
    m: MapState,
    ki: jnp.ndarray,
    inv_sigma2_table: jnp.ndarray,
    min_kf_obs: jnp.ndarray,
    *,
    scale_factor: float,
    n_levels: int,
    nn_tri: int,
    nn_fuse: int,
    fuse_hop: int,
    window: int,
):
    """One-dispatch LocalMapping epoch for new keyframe `ki`.

    Stages (same order as LocalMapping::Run, LocalMapping.cc:47-109):
      1. triangulate vs the `nn_tri` best covisible KFs (CreateNewMapPoints,
         :207) — lax.scan over the neighbor list, insertion carried in the
         scan state;
      2. recent-point culling (MapPointCulling, :170);
      3. bidirectional fuse vs the two-hop neighbor set (SearchInNeighbors,
         :454) — a single scan over directed (src, dst) pairs; duplicate
         pairs from hop overlap are no-ops (Replace/self-merge gates);
      4. representative-descriptor refresh for the new KF's points
         (:541-552);
      5. redundant-keyframe culling (KeyFrameCulling, :632) with the
         protect set (origin pair, current KF, recent + covisible window)
         computed in-graph.

    The host's only jobs left per keyframe are local BA (its own fused
    program) and loop closing. vs the former per-stage host loop this cuts
    the mapping job from ~60-100 device dispatches to one — on a tunneled
    chip that is the difference between ~30 s and ~1 RTT of wire time.

    Round 5: the per-neighbor lax.scan bodies are BATCHED. Triangulation
    candidates for all neighbors are produced by vmapped chunks and
    inserted once (first good neighbor per keypoint — the reference's
    first-come order over neighbors); fusion matches for all directed
    pairs are computed against one snapshot and applied as one merge
    (pointer-jumped replacement map). The sequential version re-scattered
    the full observation table and a (P,) histogram per step — 100
    neighbor-steps of TPU scatters was the 428 ms front of round 4.
    """
    K, N = m.kf_obs_pt.shape
    P = m.capacity_pt

    # One covisibility matrix serves neighbor selection for triangulation,
    # fusion targets and their hops (KeyFrame::GetBestCovisibilityKeyFrames,
    # /root/reference/src/KeyFrame.cc:226) — the scan of per-anchor
    # shared_point_counts cost a (K, N) sort per step.
    W = covisibility_weights(m)
    W = jnp.where(m.kf_valid[None, :] & m.kf_valid[:, None], W, 0.0)
    fids = jnp.where(m.kf_valid, m.kf_frame_id, -1)

    def top_covis(anchor, n, row=None):
        row = W[anchor] if row is None else row
        row = row.at[anchor].set(0.0)
        tv, ti = jax.lax.top_k(row, n)
        covis = jnp.where(tv > 0, ti.astype(jnp.int32), -1)
        f = fids.at[anchor].set(-1)
        rv, ri = jax.lax.top_k(f, n)
        recent = jnp.where(rv >= 0, ri.astype(jnp.int32), -1)
        return jnp.where(jnp.any(tv > 0), covis, recent)

    # -- 1. batched triangulation vs best covisible neighbors --------------
    neighbors = top_covis(ki, min(nn_tri, K))
    CH = 4  # vmapped pairs per scan step; caps live (C, N, N) intermediates
    n_nb = neighbors.shape[0]
    n_ch = -(-n_nb // CH)
    nb_pad = jnp.concatenate(
        [neighbors, jnp.full((n_ch * CH - n_nb,), -1, jnp.int32)]
    )

    def tri_chunk(_, nb):
        out = jax.vmap(
            lambda ko: triangulate_new_points(
                cam, m, ki, ko, inv_sigma2_table,
                scale_factor=scale_factor, n_levels=n_levels,
            )
        )(jnp.maximum(nb, 0))
        xyz, _desc, nvec, mind, maxd, _sn, slot_old, good = out
        return None, (xyz, nvec, mind, maxd, slot_old, good & (nb >= 0)[:, None])

    _, cand = jax.lax.scan(tri_chunk, None, nb_pad.reshape(n_ch, CH))
    xyz, nvec, mind, maxd, slot_old, good = jax.tree.map(
        lambda a: a.reshape((n_ch * CH,) + a.shape[2:]), cand
    )
    # First good neighbor per new-KF keypoint — each keypoint gains at most
    # one point, like the reference where an earlier neighbor's new
    # MapPoint removes the keypoint from later SearchForTriangulation.
    choice = jnp.argmax(good, axis=0)
    sel = jnp.any(good, axis=0)
    cols = jnp.arange(N)
    from tpuslam.mapstate.core import insert_points

    m, slots = insert_points(
        m, xyz[choice, cols], m.kf_kp_desc[ki], ki, sel,
        nvec[choice, cols], mind[choice, cols], maxd[choice, cols],
    )
    created = sel & (slots >= 0)
    prev_c = nb_pad[choice]
    flat_obs = jnp.concatenate(
        [m.kf_obs_pt.reshape(-1), jnp.zeros((1,), jnp.int32)]
    )
    idx_new = jnp.where(created, ki * N + cols, K * N)
    idx_old = jnp.where(
        created, jnp.maximum(prev_c, 0) * N + slot_old[choice, cols], K * N
    )
    flat_obs = flat_obs.at[idx_new].set(jnp.where(created, slots, 0))
    flat_obs = flat_obs.at[idx_old].set(jnp.where(created, slots, 0))
    m = m._replace(kf_obs_pt=flat_obs[: K * N].reshape(K, N))

    # -- 2. recent-point culling ------------------------------------------
    m = cull_map_points(m, ki, min_kf_obs)

    # -- 3. two-hop bidirectional fusion: batched match, one application --
    targets = top_covis(ki, min(nn_fuse, K))
    if fuse_hop > 0:
        hops = jax.vmap(
            lambda tgt: jnp.where(
                tgt >= 0,
                top_covis(jnp.maximum(tgt, 0), min(fuse_hop, K)),
                -1,
            )
        )(targets)
        ext = jnp.concatenate([targets, hops.reshape(-1)])
    else:
        ext = targets
    ext = jnp.where(ext == ki, -1, ext)
    if fuse_hop > 0:
        ext = dedupe_fuse_targets(ext, K, nn_fuse)
    fwd = jnp.stack([jnp.full_like(ext, ki), ext], axis=1)
    bwd = jnp.stack([ext, jnp.full_like(ext, ki)], axis=1)
    pairs = jnp.concatenate([fwd, bwd], axis=0)          # (Q, 2)
    Q = pairs.shape[0]

    # Observation counts once (merge arbitration, MapPoint::Replace).
    has_all = (m.kf_obs_pt >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
    flat_pt = jnp.where(has_all, m.kf_obs_pt, P).reshape(-1)
    cnt = jnp.zeros((P + 1,)).at[flat_pt].add(1.0)[:P]

    qch = -(-Q // CH)
    pairs_pad = jnp.concatenate(
        [pairs, jnp.full((qch * CH - Q, 2), -1, jnp.int32)]
    )

    def fuse_chunk(_, pr):
        out = jax.vmap(
            lambda p: _fuse_pair_match(
                cam, m, cnt, jnp.maximum(p[0], 0), jnp.maximum(p[1], 0),
                inv_sigma2_table, scale_factor=scale_factor,
                n_levels=n_levels, enabled=(p[0] >= 0) & (p[1] >= 0),
            )
        )(pr)
        return None, out

    _, fz = jax.lax.scan(fuse_chunk, None, pairs_pad.reshape(qch, CH, 2))
    tgt_slot, add, merge, winner, loser = jax.tree.map(
        lambda a: a.reshape((qch * CH,) + a.shape[2:]), fz
    )

    # Merge application: one replacement map over all pairs. Conflicting
    # winners for the same loser resolve by scatter order (last pair wins —
    # the sequential semantics kept one arbitrary winner too); the strict
    # (count, index) arbitration order makes chains acyclic, and pointer
    # jumping collapses them (MapPoint::Replace redirection).
    merge_f = merge.reshape(-1)
    loser_f = jnp.where(merge_f, loser.reshape(-1), P)
    winner_f = jnp.where(merge_f, winner.reshape(-1), P)
    repl = jnp.concatenate(
        [jnp.arange(P, dtype=jnp.int32), jnp.full((1,), P, jnp.int32)]
    )
    repl = repl.at[loser_f].set(winner_f)
    repl = repl[repl]
    repl = repl[repl]
    repl = repl[repl]  # path-halving: resolves chains up to depth 8
    repl = repl[:P]

    obs = m.kf_obs_pt
    obs = jnp.where(obs >= 0, repl[jnp.maximum(obs, 0)], obs)
    pt_valid = m.pt_valid & (repl == jnp.arange(P, dtype=jnp.int32))

    # Add observations for free matched keypoints: flat (dst, tgt_slot)
    # scatter across all pairs (parked rows write the scratch slot).
    dst_f = pairs_pad[:, 1]
    add_f = add & (dst_f >= 0)[:, None]
    flat_idx = jnp.where(
        add_f, jnp.maximum(dst_f, 0)[:, None] * N + tgt_slot, K * N
    ).reshape(-1)
    p_src_pair = jnp.where(
        m.kf_obs_pt[jnp.maximum(pairs_pad[:, 0], 0)] >= 0,
        m.kf_obs_pt[jnp.maximum(pairs_pad[:, 0], 0)], 0
    )
    val = repl[p_src_pair].reshape(-1)
    obs_flat = jnp.concatenate([obs.reshape(-1), jnp.zeros((1,), jnp.int32)])
    obs_flat = obs_flat.at[flat_idx].set(val)
    m = m._replace(
        kf_obs_pt=obs_flat[: K * N].reshape(K, N), pt_valid=pt_valid
    )

    # -- 4. descriptor refresh for the new KF's points --------------------
    from tpuslam.mapstate.core import compute_point_descriptors

    cur_obs = m.kf_obs_pt[ki]
    touched = (
        jnp.zeros((m.capacity_pt + 1,), bool)
        .at[jnp.where(cur_obs >= 0, cur_obs, m.capacity_pt)]
        .set(True)[: m.capacity_pt]
    )
    m = compute_point_descriptors(m, touched)

    # -- 5. redundant-keyframe culling ------------------------------------
    w = min(window, K)
    protect = jnp.zeros((K,), bool).at[0].set(True).at[1].set(True)
    protect = protect.at[ki].set(True)
    fids = jnp.where(m.kf_valid, m.kf_frame_id, -1)
    rv, ri = jax.lax.top_k(fids, w)
    protect = protect.at[jnp.where(rv >= 0, ri, 0)].max(rv >= 0)
    cov = best_covisible_ids(m, ki, w)
    protect = protect.at[jnp.maximum(cov, 0)].max(cov >= 0)
    m, _ = cull_keyframes(m, ki, protect)
    return m
