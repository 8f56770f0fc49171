"""Batched ORB matching search modes.

TPU-native redesign of the reference's ORBmatcher
(/root/reference/src/ORBmatcher.cc): every mode becomes one dense masked
all-pairs problem over fixed-capacity keypoint arrays instead of per-feature
loops over a 64x48 bucket grid — the VPU eats the (Nq, Nc) distance matrix
and the mask encodes the search window / octave gates / thresholds.

Constants TH_HIGH / TH_LOW / HISTO_LENGTH match ORBmatcher.cc:37-39.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuslam.matching.hamming import hamming_matrix

TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30
_BIG = 1 << 20  # sentinel distance for masked pairs


def _best_two(dist: jnp.ndarray):
    """Per-row best and second-best over (Nq, Nc): returns (d1, i1, d2)."""
    # Materialize the distance matrix once: XLA:CPU otherwise re-runs the
    # whole producer chain (hamming + window masks) for each of the three
    # consumers below (argmin / gather / masked-min) — 3x the matcher cost.
    dist = jax.lax.optimization_barrier(dist)
    i1 = jnp.argmin(dist, axis=1)
    d1 = jnp.take_along_axis(dist, i1[:, None], axis=1)[:, 0]
    masked = dist.at[jnp.arange(dist.shape[0]), i1].set(_BIG)
    d2 = jnp.min(masked, axis=1)
    return d1, i1, d2


def resolve_duplicates(idx: jnp.ndarray, dist: jnp.ndarray, valid: jnp.ndarray, n_targets: int):
    """Enforce one-to-one: when several queries match the same target, keep
    only the lowest-distance one (the reference does this with eviction during
    its sequential loops, e.g. SearchForInitialization ORBmatcher.cc:417).

    idx: (Nq,) target index per query; dist: (Nq,); valid: (Nq,) bool.
    Returns a tightened valid mask.
    """
    tgt = jnp.where(valid, idx, n_targets)  # park invalid in a scratch slot
    best = jnp.full((n_targets + 1,), _BIG, dtype=dist.dtype).at[tgt].min(
        jnp.where(valid, dist, _BIG)
    )
    # A query survives if it achieves the minimum for its target. Ties: keep
    # the lowest query index.
    is_best = valid & (dist == best[tgt])
    qidx = jnp.arange(idx.shape[0])
    first_q = jnp.full((n_targets + 1,), 1 << 30, dtype=jnp.int32).at[tgt].min(
        jnp.where(is_best, qidx, 1 << 30)
    )
    return is_best & (first_q[tgt] == qidx)


def rotation_consistency_mask(
    angle_q: jnp.ndarray, angle_t: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Keep only matches whose rotation offset falls in the 3 dominant bins
    of a 30-bin histogram (ORBmatcher::ComputeThreeMaxima,
    /root/reference/src/ORBmatcher.cc:1679-1723, incl. the 0.1x dominance
    rule that drops weak second/third bins).

    angle_q/angle_t: (N,) radians for the two sides of each match.
    """
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(angle_q - angle_t, two_pi)  # [0, 2pi)
    binf = rot * (HISTO_LENGTH / two_pi)
    b = jnp.round(binf).astype(jnp.int32) % HISTO_LENGTH
    onehot = (
        (b[:, None] == jnp.arange(HISTO_LENGTH)[None, :]) & valid[:, None]
    ).astype(jnp.int32)
    hist = jnp.sum(onehot, axis=0)  # (30,)
    top3, _ = jax.lax.top_k(hist, 3)
    max1 = top3[0]
    keep2 = top3[1].astype(jnp.float32) > 0.1 * max1.astype(jnp.float32)
    keep3 = top3[2].astype(jnp.float32) > 0.1 * max1.astype(jnp.float32)
    thresh = jnp.where(keep3, top3[2], jnp.where(keep2, top3[1], max1))
    good_bin = hist >= jnp.maximum(thresh, 1)
    return valid & good_bin[b]


def match_nn_ratio(
    desc_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    pair_mask: jnp.ndarray,
    max_dist: int = TH_LOW,
    nn_ratio: float = 0.9,
):
    """Generic best/second-best matching with ratio test.

    desc_q: (Nq, 8) uint32; desc_t: (Nt, 8); pair_mask: (Nq, Nt) bool of
    admissible pairs. Returns (idx (Nq,), dist (Nq,), valid (Nq,)).
    """
    dist = jnp.where(pair_mask, hamming_matrix(desc_q, desc_t), _BIG)
    d1, i1, d2 = _best_two(dist)
    # Strict < like the reference (ORBmatcher.cc SearchByBoW): equal best and
    # second-best distances are ambiguous and rejected.
    valid = (d1 <= max_dist) & (d1.astype(jnp.float32) < nn_ratio * d2.astype(jnp.float32))
    return i1, d1, valid


def search_for_initialization(
    xy1: jnp.ndarray,
    desc1: jnp.ndarray,
    level1: jnp.ndarray,
    angle1: jnp.ndarray,
    valid1: jnp.ndarray,
    xy2: jnp.ndarray,
    desc2: jnp.ndarray,
    level2: jnp.ndarray,
    angle2: jnp.ndarray,
    valid2: jnp.ndarray,
    window: float = 100.0,
    nn_ratio: float = 0.9,
    check_rotation: bool = True,
):
    """Monocular-initialization matching (ORBmatcher::SearchForInitialization,
    /root/reference/src/ORBmatcher.cc:417-590): level-0 keypoints only,
    windowed around the frame-1 location, NN ratio, mutual eviction,
    rotation-consistency filter.

    Returns (idx2 (N1,), dist (N1,), valid (N1,)).
    """
    pair = (
        valid1[:, None]
        & valid2[None, :]
        & (level1[:, None] == 0)
        & (level2[None, :] == 0)
        & (jnp.abs(xy1[:, 0, None] - xy2[None, :, 0]) < window)
        & (jnp.abs(xy1[:, 1, None] - xy2[None, :, 1]) < window)
    )
    idx, dist, valid = match_nn_ratio(desc1, desc2, pair, TH_LOW, nn_ratio)
    valid = resolve_duplicates(idx, dist, valid, xy2.shape[0])
    if check_rotation:
        valid = rotation_consistency_mask(angle1, angle2[idx], valid)
    return idx, dist, valid


def search_by_projection_points(
    uv_proj: jnp.ndarray,
    pt_desc: jnp.ndarray,
    pt_valid: jnp.ndarray,
    radius: jnp.ndarray,
    level_lo: jnp.ndarray,
    level_hi: jnp.ndarray,
    kp_xy: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_level: jnp.ndarray,
    kp_angle: jnp.ndarray,
    kp_valid: jnp.ndarray,
    max_dist: int = TH_HIGH,
    nn_ratio: float = 0.0,
    ratio_same_level_only: bool = True,
):
    """Project-and-search: match projected map points against frame keypoints.

    Covers both projection modes of the reference —
    track-local-map (ORBmatcher.cc:45: radius from viewing angle x scale,
    octave window [pred-1, pred+1], ratio applied only when best and second
    lie on the same level) and track-last-frame (ORBmatcher.cc:1396: radius
    th x scale(last octave), forward/backward octave gate).

    uv_proj: (Np, 2) predicted pixel positions; radius: (Np,) per-point
    search radius in px; level_lo/hi: (Np,) inclusive octave window.
    Returns (idx (Np,), dist (Np,), valid (Np,)).
    """
    du = jnp.abs(uv_proj[:, 0, None] - kp_xy[None, :, 0])
    dv = jnp.abs(uv_proj[:, 1, None] - kp_xy[None, :, 1])
    pair = (
        pt_valid[:, None]
        & kp_valid[None, :]
        & (du < radius[:, None])
        & (dv < radius[:, None])
        & (kp_level[None, :] >= level_lo[:, None])
        & (kp_level[None, :] <= level_hi[:, None])
    )
    dist = jnp.where(pair, hamming_matrix(pt_desc, kp_desc), _BIG)
    d1, i1, d2 = _best_two(dist)
    valid = pt_valid & (d1 <= max_dist)
    if nn_ratio > 0.0:
        lvl1 = kp_level[i1]
        # Level of the second-best keypoint:
        masked = dist.at[jnp.arange(dist.shape[0]), i1].set(_BIG)
        i2 = jnp.argmin(masked, axis=1)
        lvl2 = kp_level[i2]
        ratio_fail = d1.astype(jnp.float32) > nn_ratio * d2.astype(jnp.float32)
        if ratio_same_level_only:
            ratio_fail &= lvl1 == lvl2
        valid &= ~ratio_fail
    valid = resolve_duplicates(i1, d1, valid, kp_xy.shape[0])
    return i1, d1, valid


def search_by_projection_frame(
    uv_proj: jnp.ndarray,
    proj_valid: jnp.ndarray,
    last_level: jnp.ndarray,
    last_desc: jnp.ndarray,
    last_angle: jnp.ndarray,
    kp_xy: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_level: jnp.ndarray,
    kp_angle: jnp.ndarray,
    kp_valid: jnp.ndarray,
    th: float = 7.0,
    scale_factor: float = 1.2,
    check_rotation: bool = True,
):
    """Track-with-motion-model matching (ORBmatcher::SearchByProjection for
    the last frame, /root/reference/src/ORBmatcher.cc:1396): project last
    frame's map points into the current frame, search radius th x
    scale^octave around the prediction, octave gate [oct-1, oct+1], TH_HIGH,
    rotation-consistency filter.

    uv_proj/(proj_valid): projections of last-frame points into the current
    frame; last_level/desc/angle: attributes of those points' keypoints in
    the last frame. Returns (idx, dist, valid) over last-frame points.
    """
    radius = th * scale_factor ** last_level.astype(jnp.float32)
    idx, dist, valid = search_by_projection_points(
        uv_proj,
        last_desc,
        proj_valid,
        radius,
        jnp.maximum(last_level - 1, 0),
        last_level + 1,
        kp_xy,
        kp_desc,
        kp_level,
        kp_angle,
        kp_valid,
        max_dist=TH_HIGH,
        nn_ratio=0.0,
    )
    if check_rotation:
        valid = rotation_consistency_mask(last_angle, kp_angle[idx], valid)
    return idx, dist, valid
