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


def _sad_refine_level(
    imgL: jnp.ndarray,
    imgR: jnp.ndarray,
    uL: jnp.ndarray,
    vL: jnp.ndarray,
    uR0: jnp.ndarray,
    active: jnp.ndarray,
):
    """Batched SAD subpixel refinement on one pyramid level.

    uL, vL, uR0: (N,) level-scaled coordinates. Returns (uR_refined (N,),
    best_sad (N,), ok (N,)). Follows Frame.cc:799-847: 11x11 windows with
    center-intensity normalization, slide incR in [-5, 5], parabola on the
    best three.
    """
    H, W = imgL.shape
    iL_u = jnp.round(uL).astype(jnp.int32)
    iL_v = jnp.round(vL).astype(jnp.int32)
    iR_u0 = jnp.round(uR0).astype(jnp.int32)

    dy, dx = jnp.mgrid[-_W : _W + 1, -_W : _W + 1]

    ys = jnp.clip(iL_v[:, None, None] + dy[None], 0, H - 1)
    xs = jnp.clip(iL_u[:, None, None] + dx[None], 0, W - 1)
    patchL = imgL[ys, xs]  # (N, 11, 11)
    patchL = patchL - patchL[:, _W : _W + 1, _W : _W + 1]

    sads = []
    for incR in range(-_L, _L + 1):
        xr = jnp.clip(iR_u0[:, None, None] + incR + dx[None], 0, W - 1)
        patchR = imgR[ys, xr]
        patchR = patchR - patchR[:, _W : _W + 1, _W : _W + 1]
        sads.append(jnp.sum(jnp.abs(patchL - patchR), axis=(1, 2)))
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
    return uR, best_sad, ok


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

    # SAD subpixel per pyramid level (static unroll).
    uR_best = jnp.full((NL,), -1.0, dtype=jnp.float32)
    sad_best = jnp.full((NL,), jnp.inf, dtype=jnp.float32)
    ok_all = jnp.zeros((NL,), dtype=bool)
    uR0_l0 = uR[i1]
    for l in range(config.n_levels):
        inv = 1.0 / float(config.scale_factor**l)
        active = matched & (feats_left.level == l)
        uR_l, sad_l, ok_l = _sad_refine_level(
            pyr_left[l],
            pyr_right[l],
            uL * inv,
            vL * inv,
            uR0_l0 * inv,
            active,
        )
        uR_l0 = uR_l / inv  # back to level-0 coords (Frame.cc:839)
        uR_best = jnp.where(active & ok_l, uR_l0, uR_best)
        sad_best = jnp.where(active & ok_l, sad_l, sad_best)
        ok_all = ok_all | (active & ok_l)

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
