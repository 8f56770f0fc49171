"""Stereo keypoint matching: row-banded Hamming search + SAD subpixel.

TPU-native equivalent of Frame::ComputeStereoMatches
(/root/reference/src/Frame.cc:630-872): for rectified stereo pairs, each
left keypoint is matched to right keypoints in a row band (radius
2 x scale(octave)), within the disparity range [0, fx], by descriptor
distance <= (TH_HIGH + TH_LOW)/2 = 75; the match is then refined to subpixel
with an 11x11 SAD slide (+-5) on the keypoint's pyramid level and a parabola
fit (Frame.cc:819-835), and outliers are culled against the median SAD
(Frame.cc:852-871: threshold 2.1 x median).

The reference's per-row candidate table + per-keypoint loop becomes one
dense masked (NL, NR) problem plus a batched gather for SAD; the per-level
work is unrolled statically over the 8 octaves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuslam.matching.hamming import hamming_matrix
from tpuslam.ops.orb import ORBConfig, ORBFeatures

_BIG = 1 << 20
_W = 5  # SAD half-window (Frame.cc:799 w=5)
_L = 5  # SAD slide radius (Frame.cc:805 L=5)


def _sad_refine_all_levels(
    pyrL,
    pyrR,
    level: jnp.ndarray,
    uL0: jnp.ndarray,
    vL0: jnp.ndarray,
    uR0_l0: jnp.ndarray,
    active: jnp.ndarray,
    config: ORBConfig,
):
    """Batched SAD subpixel refinement, ALL pyramid levels in one pass.

    uL0, vL0, uR0_l0: (N,) level-0 coordinates; level: (N,) octaves.
    Returns (uR_refined_level0 (N,), best_sad (N,), ok (N,)). Follows
    Frame.cc:799-847: 11x11 windows with center-intensity normalization,
    slide incR in [-5, 5], parabola on the best three.

    Per-keypoint windows are cut from 47x47 patches streamed by the Pallas
    atlas gather (ops/patches.py) — the naive (N, 11, 11) image gathers are
    ~40x slower on TPU at the KITTI operating point (2000 kps, 1241-wide
    rows).
    """
    from tpuslam.ops.orb import (
        _CENTER_RAW as CENTER_RAW,
        _PAD as PAD,
        _PATCH as PATCH,
        build_patch_atlas,
    )
    from tpuslam.ops.patches import gather_patches

    atlasL, offs, Wa = build_patch_atlas(pyrL)
    atlasR, _, _ = build_patch_atlas(pyrR)
    n_levels = config.n_levels
    inv_tab = jnp.asarray(
        [1.0 / config.scale_factor**l for l in range(n_levels)], jnp.float32
    )
    lo_tab = jnp.asarray(offs, jnp.int32)
    hi_tab = jnp.asarray(
        [offs[l] + pyrL[l].shape[0] + 2 * PAD - PATCH for l in range(n_levels)],
        jnp.int32,
    )
    inv = inv_tab[level]
    ul = uL0 * inv
    vl = vL0 * inv
    iL_u = jnp.round(ul).astype(jnp.int32)
    iL_v = jnp.round(vl).astype(jnp.int32)
    iR_u0 = jnp.round(uR0_l0 * inv).astype(jnp.int32)

    row = jnp.clip(lo_tab[level] + PAD + iL_v - CENTER_RAW, lo_tab[level], hi_tab[level])
    # Columns clip to the PER-LEVEL content width, not the global atlas
    # width: upper levels are narrower and an over-scaled right coordinate
    # would otherwise read the zero padding right of the level block.
    col_hi_tab = jnp.asarray(
        [pyrL[l].shape[1] + 2 * PAD - PATCH for l in range(n_levels)], jnp.int32
    )
    colL = jnp.clip(PAD + iL_u - CENTER_RAW, 0, col_hi_tab[level])
    colR = jnp.clip(PAD + iR_u0 - CENTER_RAW, 0, col_hi_tab[level])
    # Frame.cc:805-812: skip candidates whose 11x11 + slide window leaves the
    # level image instead of matching against padding.
    width_l = jnp.asarray([pyrL[l].shape[1] for l in range(n_levels)], jnp.int32)[level]
    win = _W + _L
    in_level = (iR_u0 - win >= 0) & (iR_u0 + win < width_l)
    active = active & in_level
    pL = gather_patches(atlasL, jnp.stack([row, colL], axis=-1))  # (N,47,47)
    pR = gather_patches(atlasR, jnp.stack([row, colR], axis=-1))

    C = CENTER_RAW
    patchL = pL[:, C - _W : C + _W + 1, C - _W : C + _W + 1]
    patchL = patchL - pL[:, C : C + 1, C : C + 1]
    sads = []
    for incR in range(-_L, _L + 1):
        pr = pR[:, C - _W : C + _W + 1, C - _W + incR : C + _W + 1 + incR]
        pr = pr - pR[:, C : C + 1, C + incR : C + incR + 1]
        sads.append(jnp.sum(jnp.abs(patchL - pr), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)  # (N, 11)

    best = jnp.argmin(sad, axis=1)
    best_sad = jnp.take_along_axis(sad, best[:, None], axis=1)[:, 0]
    # Parabola fit needs interior best (Frame.cc:825: reject slide-edge best).
    interior = (best > 0) & (best < 2 * _L)
    bi = jnp.clip(best, 1, 2 * _L - 1)
    d_m = jnp.take_along_axis(sad, (bi - 1)[:, None], axis=1)[:, 0]
    d_0 = jnp.take_along_axis(sad, bi[:, None], axis=1)[:, 0]
    d_p = jnp.take_along_axis(sad, (bi + 1)[:, None], axis=1)[:, 0]
    denom = d_m + d_p - 2.0 * d_0
    delta = jnp.where(jnp.abs(denom) > 1e-6, (d_m - d_p) / (2.0 * denom), 0.0)
    ok = active & interior & (delta >= -1.0) & (delta <= 1.0)
    uR = iR_u0.astype(jnp.float32) + (bi - _L).astype(jnp.float32) + delta
    return uR / inv, best_sad, ok  # back to level-0 coords (Frame.cc:839)


def stereo_match(
    feats_left: ORBFeatures,
    feats_right: ORBFeatures,
    pyr_left,
    pyr_right,
    config: ORBConfig,
    fx: float,
    bf: float,
):
    """Match left keypoints to the right image, return (u_right, depth, valid).

    feats_*: ORBFeatures in level-0 coords; pyr_*: pyramid image lists.
    u_right is the refined right-image column at level 0 (the reference's
    mvuRight); depth = bf / (uL - uR) (mvDepth). Invalid entries carry
    u_right = -1, depth = 0 like the reference.
    """
    NL = feats_left.xy.shape[0]
    scale = jnp.asarray(
        [config.scale_factor**l for l in range(config.n_levels)], dtype=jnp.float32
    )
    sL = scale[feats_left.level]
    uL = feats_left.xy[:, 0]
    vL = feats_left.xy[:, 1]
    uR = feats_right.xy[:, 0]
    vR = feats_right.xy[:, 1]

    min_d = 0.0
    max_d = fx  # minZ = baseline => maxD = bf/minZ = fx (Frame.cc:645-647)

    row_r = 2.0 * sL  # row search band (Frame.cc:677)
    pair = (
        feats_left.valid[:, None]
        & feats_right.valid[None, :]
        & (jnp.abs(vR[None, :] - vL[:, None]) <= row_r[:, None])
        & (feats_right.level[None, :] >= feats_left.level[:, None] - 1)
        & (feats_right.level[None, :] <= feats_left.level[:, None] + 1)
        & (uR[None, :] >= (uL[:, None] - max_d))
        & (uR[None, :] <= (uL[:, None] - min_d))
    )
    dist = jnp.where(pair, hamming_matrix(feats_left.desc, feats_right.desc), _BIG)
    d1 = jnp.min(dist, axis=1)
    i1 = jnp.argmin(dist, axis=1)
    th_orb = (100 + 50) // 2  # (TH_HIGH + TH_LOW)/2, Frame.cc:640
    matched = d1 < th_orb

    # SAD subpixel, all pyramid levels in one batched pass.
    uR0_l0 = uR[i1]
    uR_l0, sad_best, ok_all = _sad_refine_all_levels(
        pyr_left, pyr_right, feats_left.level, uL, vL, uR0_l0, matched, config
    )
    uR_best = jnp.where(ok_all, uR_l0, -1.0)
    sad_best = jnp.where(ok_all, sad_best, jnp.inf)

    disparity = uL - uR_best
    in_range = (disparity > min_d) & (disparity < max_d)
    # Reference snaps disparity <= 0 to 0.01 (Frame.cc:846); we just require
    # a strictly positive disparity.
    valid = ok_all & in_range

    # Median-SAD outlier cull (Frame.cc:852-871): drop dist >= 2.1 x median.
    sad_for_median = jnp.where(valid, sad_best, jnp.nan)
    med = jnp.nanmedian(sad_for_median)
    med = jnp.where(jnp.isnan(med), jnp.inf, med)
    valid &= sad_best < 2.1 * med

    depth = jnp.where(valid, bf / jnp.maximum(disparity, 1e-6), 0.0)
    u_right = jnp.where(valid, uR_best, -1.0)
    return u_right, depth, valid
