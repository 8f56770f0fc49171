"""ORB feature extraction as batched JAX ops (TPU-native ORBextractor).

Covers the full behavior of the reference's ORBextractor
(/root/reference/src/ORBextractor.cc): 8-level pyramid, per-cell FAST with
dual thresholds (ComputeKeyPointsOctTree :915), spatially-uniform selection
(DistributeOctTree :644), intensity-centroid orientation (IC_Angle :84),
Gaussian blur + steered 256-bit BRIEF (computeOrbDescriptor :141), packed
descriptors, coordinates rescaled to level 0 (:1322).

TPU-first redesign decisions (documented deviations):

- FAST runs densely over the whole level with the LOW threshold once; the
  per-pixel response is OpenCV's FAST score (the max threshold at which the
  pixel stays a corner), so the reference's 20 -> 7 per-cell fallback
  (ORBextractor.cc:976-987) is reproduced exactly by masking: a cell keeps
  its response >= iniTh corners if it has any, else its response >= minTh
  corners — without running FAST twice.
- The sequential quadtree (DistributeOctTree) is replaced by per-cell rank
  ordering: candidates are ranked inside their 30px cell by response, then
  selected globally by (rank-in-cell, -response) up to the per-level budget.
  Like the quadtree this takes the single best corner from every occupied
  region first, then second-best, etc. — same spatial-uniformity intent,
  fully parallel.
- The descriptor sampling pattern is our own deterministic BRIEF-style
  pattern (seeded Gaussian, sigma = patch/5, clipped to the 31px patch) —
  NOT the reference's learned bit_pattern_31_. Descriptors are therefore not
  bit-compatible with OpenCV ORB; the whole pipeline (matching, vocabulary)
  uses this pattern consistently.

All outputs are fixed-capacity arrays + validity masks; everything is
jit-safe with static shapes.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.ops.image import build_pyramid, gaussian_blur, pyramid_shapes
from tpuslam.ops.patches import gather_patches

from tpuslam.ops.orb_common import FAST_OFFSETS as _FAST_OFFSETS

# Border in which no keypoint may lie: EDGE_THRESHOLD - 3 = 16 in the
# reference (ORBextractor.cc minBorderX), which is what the quadtree cells
# cover; descriptor/orientation gathers clamp at image bounds.
_DETECT_BORDER = 16
HALF_PATCH = 15  # orientation patch radius (IC_Angle, ORBextractor.cc:84)
_N_PAIRS = 256


def _make_brief_pattern(seed: int = 1234) -> np.ndarray:
    """Deterministic BRIEF-II style pattern: (256, 2, 2) int32 (pair, point, xy).

    Points drawn iid from N(0, (patch/5)^2) clipped to [-13, 13] like the
    original BRIEF construction; the reference instead ships a learned
    pattern (ORBextractor.cc:196-464), which we deliberately do not copy.
    Degenerate pairs (identical points) are resampled deterministically.
    """
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = np.clip(np.round(rng.normal(0.0, sigma, size=(_N_PAIRS * 2, 2))), -13, 13).astype(
        np.int32
    )
    pattern = pts.reshape(_N_PAIRS, 2, 2)
    # Resample degenerate pairs.
    for i in range(_N_PAIRS):
        tries = 0
        while np.all(pattern[i, 0] == pattern[i, 1]) and tries < 100:
            pattern[i, 1] = np.clip(np.round(rng.normal(0.0, sigma, size=2)), -13, 13).astype(
                np.int32
            )
            tries += 1
    return pattern


def _load_brief_pattern() -> np.ndarray:
    """Shipped LEARNED pattern (tools/train_brief_pattern.py: greedy
    decorrelation over steered synthetic patches, the ORB paper's §4.3
    procedure re-run on our own corpus — intent of the reference's
    bit_pattern_31_ without copying its bits); falls back to the seeded
    Gaussian when the artifact is absent."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        "brief_pattern.npz",
    )
    if os.path.exists(path):
        pat = np.load(path)["pattern"].astype(np.int32)
        if pat.shape == (_N_PAIRS, 2, 2):
            return pat
    return _make_brief_pattern()


BRIEF_PATTERN = _load_brief_pattern()


@dataclasses.dataclass(frozen=True)
class ORBConfig:
    """Extraction settings, mirroring the ORBextractor.* YAML block
    (/root/reference/Examples/Monocular/TUM1.yaml:27-42)."""

    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0
    cell_size: int = 30  # FAST cell width (ORBextractor.cc:930 W=30)

    def level_budgets(self) -> tuple:
        """Geometric per-level feature budget, ORBextractor ctor semantics
        (/root/reference/src/ORBextractor.cc:494-510)."""
        factor = 1.0 / self.scale_factor
        n_desired = self.n_features * (1 - factor) / (1 - factor**self.n_levels)
        budgets = []
        total = 0
        for _ in range(self.n_levels - 1):
            b = int(round(n_desired))
            budgets.append(b)
            total += b
            n_desired *= factor
        budgets.append(max(self.n_features - total, 0))
        return tuple(budgets)

    def level_scales(self) -> tuple:
        return tuple(self.scale_factor**l for l in range(self.n_levels))


from typing import NamedTuple


class ORBFeatures(NamedTuple):
    """Fixed-capacity [N] keypoint arrays (N = config.n_features).

    xy is in level-0 (full-resolution, distorted-image) pixel coordinates,
    like the reference's rescaled keypoints (ORBextractor.cc:1322-1329).
    """

    xy: jnp.ndarray        # (N, 2) float32, level-0 coords
    response: jnp.ndarray  # (N,) float32 FAST score
    angle: jnp.ndarray     # (N,) float32 radians
    level: jnp.ndarray     # (N,) int32 pyramid octave
    desc: jnp.ndarray      # (N, 8) uint32 packed 256-bit descriptor
    valid: jnp.ndarray     # (N,) bool

    @property
    def n_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def fast_response(img: jnp.ndarray, min_th: float) -> jnp.ndarray:
    """Dense FAST-9/16 corner response for a (H, W) float image.

    Response is OpenCV's FAST score: the largest threshold at which the pixel
    still has >= 9 contiguous circle pixels all brighter (or all darker) than
    center +- threshold. Pixels failing at min_th get response 0. 3x3
    non-max suppression is applied by the caller.
    """
    H, W = img.shape
    # Circle dimension MINOR: the arc rolls become contiguous 64-byte lane
    # shuffles instead of (H, W)-plane copies — this stage is
    # bandwidth-bound on the XLA fallback path (CPU uses the native C++
    # kernel instead; see fast_nms).
    p = jnp.pad(img, 3, mode="edge")
    circ = jnp.stack(
        [p[3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W] for dx, dy in _FAST_OFFSETS],
        axis=-1,
    )                                     # (H, W, 16)
    d = circ - img[..., None]             # positive = brighter than center

    def arc9_min(x):
        """min over 9 consecutive circular entries, for each start index."""
        m1 = jnp.minimum(x, jnp.roll(x, -1, axis=-1))
        m2 = jnp.minimum(m1, jnp.roll(m1, -2, axis=-1))
        m4 = jnp.minimum(m2, jnp.roll(m2, -4, axis=-1))  # covers 8
        return jnp.minimum(m4, jnp.roll(x, -8, axis=-1))  # covers 9

    score_bright = jnp.max(arc9_min(d), axis=-1)
    score_dark = jnp.max(arc9_min(-d), axis=-1)
    score = jnp.maximum(score_bright, score_dark)
    return jnp.where(score > min_th, score, 0.0)


def fast_nms(img: jnp.ndarray, min_th: float) -> jnp.ndarray:
    """NMS'd FAST score map: fused Pallas kernel on TPU (ops/fast_pallas.py),
    native C++ kernel on CPU (native/src/fast.cc via pure_callback — the
    XLA elementwise formulation moves ~16 (H, W) planes per level and costs
    ~250 ms/frame on a 2-core host, the C++ kernel with the 0/8-pixel early
    reject a few ms), XLA elementwise path elsewhere. All agree away from
    the 3 px image border, which the 16 px detection border masks anyway."""
    from tpuslam.ops.patches import _use_pallas

    if _use_pallas():
        from tpuslam.ops.fast_pallas import fast_nms_pallas

        return fast_nms_pallas(img, float(min_th))
    from tpuslam.io.native import native_available

    if native_available() and jax.default_backend() == "cpu":
        from tpuslam.io.native import fast_nms_native

        def _cb(im):
            return fast_nms_native(np.asarray(im), float(min_th))

        out_sd = jax.ShapeDtypeStruct(img.shape[-2:], jnp.float32)
        if img.ndim == 2:
            return jax.pure_callback(_cb, out_sd, img, vmap_method="sequential")
        return jax.vmap(
            lambda im: jax.pure_callback(
                _cb, out_sd, im, vmap_method="sequential"
            )
        )(img)
    if img.ndim == 2:
        return _nms3(fast_response(img, min_th))
    return jax.vmap(lambda im: _nms3(fast_response(im, min_th)))(img)


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression: keep strict local maxima (row/col-major
    tie-break via tiny index bias to avoid dropping/duplicating plateaus)."""
    H, W = score.shape
    # Deterministic tie-break: prefer smaller linear index.
    bias = (
        jnp.arange(H * W, dtype=jnp.float32).reshape(H, W) * (-1e-6 / (H * W))
    )
    s = score + jnp.where(score > 0, bias, 0.0)
    pooled = jax.lax.reduce_window(
        s, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((s >= pooled) & (score > 0), score, 0.0)


def _select_level_keypoints(
    score: jnp.ndarray,
    n_keep: int,
    cell_size: int,
    ini_th: float,
) -> tuple:
    """Spatially-uniform top-n_keep selection from a response map.

    Replaces DistributeOctTree (/root/reference/src/ORBextractor.cc:644) with
    a parallel per-cell formulation: the map is tiled into cell_size cells, a
    batched top-R ranks corners within every cell, and the final order is
    (rank-in-cell asc, response desc) — one corner per occupied cell first,
    like the quadtree's best-per-node rule. Cells whose best response is
    >= ini_th contribute only >= ini_th corners (the reference's
    dual-threshold fallback at :976-987).

    Returns (xy (n_keep, 2) int32, resp (n_keep,), valid (n_keep,)).
    """
    H, W = score.shape
    # Detection border (quadtree region in the reference).
    ys_g = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs_g = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_border = (
        (xs_g >= _DETECT_BORDER)
        & (xs_g < W - _DETECT_BORDER)
        & (ys_g >= _DETECT_BORDER)
        & (ys_g < H - _DETECT_BORDER)
    )
    s = jnp.where(in_border, score, 0.0)

    n_cells_y = (H + cell_size - 1) // cell_size
    n_cells_x = (W + cell_size - 1) // cell_size
    n_cells = n_cells_y * n_cells_x
    area = cell_size * cell_size
    sp = jnp.pad(s, ((0, n_cells_y * cell_size - H), (0, n_cells_x * cell_size - W)))
    cells = sp.reshape(n_cells_y, cell_size, n_cells_x, cell_size)
    cells = cells.transpose(0, 2, 1, 3).reshape(n_cells, area)

    # Per-cell candidate depth: enough to fill the budget even when corners
    # cluster in few cells (4x headroom), at least 8, at most the cell area.
    r = min(max(8, -(-4 * n_keep // n_cells)), area, n_keep)
    # Materialization barriers: XLA:CPU otherwise re-runs the whole
    # cells/top_k producer chain once per consumer (~35 ms/level instead
    # of ~1.5 ms); neutral elsewhere.
    cells = jax.lax.optimization_barrier(cells)
    resp_c, idx_c = jax.lax.top_k(cells, r)  # (n_cells, r)
    resp_c, idx_c = jax.lax.optimization_barrier((resp_c, idx_c))
    valid = resp_c > 0.0
    # Dual threshold: if the cell has an >= ini_th corner, drop its
    # sub-ini_th corners (rank 0 is the cell max).
    valid &= ~((resp_c[:, :1] >= ini_th) & (resp_c < ini_th))

    # Global coordinates of each candidate.
    ci = jnp.arange(n_cells, dtype=jnp.int32)[:, None]
    ys = (ci // n_cells_x) * cell_size + idx_c // cell_size
    xs = (ci % n_cells_x) * cell_size + idx_c % cell_size

    # Final priority: one corner per cell first, then second-best, etc.
    rank = jnp.arange(r, dtype=jnp.float32)[None, :]
    prio = rank * 4096.0 - jnp.clip(resp_c, 0, 4095.0)
    prio = jnp.where(valid, prio, jnp.inf)
    # top_k of the negated priority == stable ascending argsort prefix
    # (ties break toward the lower index in both), at a fraction of the
    # full-sort cost.
    _, final = jax.lax.top_k(-prio.reshape(-1), n_keep)
    out_valid = valid.reshape(-1)[final] & (jnp.arange(n_keep) < n_cells * r)
    return (
        jnp.stack([xs.reshape(-1)[final], ys.reshape(-1)[final]], axis=-1).astype(
            jnp.int32
        ),
        resp_c.reshape(-1)[final],
        out_valid,
    )


_PATCH = 47          # raw patch: covers IC radius 15 + BRIEF radius 18.4 + blur 3
_PAD = 8             # image edge-padding so patches never clamp
_BLUR_PATCH = 41     # blurred interior of the raw patch
_CENTER_RAW = 23     # keypoint position inside the raw patch
_CENTER_BLUR = 20    # keypoint position inside the blurred patch


def _ic_masks():
    """Static circular first-moment masks centered at _CENTER_RAW."""
    r = HALF_PATCH
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    umax = np.round(np.sqrt(np.maximum(r * r - dy * dy, 0.0)))
    mask = (np.abs(dx) <= umax).astype(np.float32)
    m10 = np.zeros((_PATCH, _PATCH), np.float32)
    m01 = np.zeros((_PATCH, _PATCH), np.float32)
    c = _CENTER_RAW
    m10[c - r : c + r + 1, c - r : c + r + 1] = dx * mask
    m01[c - r : c + r + 1, c - r : c + r + 1] = dy * mask
    return jnp.asarray(m10), jnp.asarray(m01)


_M10, _M01 = _ic_masks()


def _blur_patches(p: jnp.ndarray) -> jnp.ndarray:
    """Batched 7x7 sigma-2 Gaussian on (N, 47, 47) -> (N, 41, 41) valid part."""
    from tpuslam.ops.image import _gaussian_kernel_1d

    k = _gaussian_kernel_1d(7, 2.0)
    acc = jnp.zeros((p.shape[0], _PATCH, _BLUR_PATCH), p.dtype)
    for i in range(7):
        acc = acc + k[i] * p[:, :, i : i + _BLUR_PATCH]
    out = jnp.zeros((p.shape[0], _BLUR_PATCH, _BLUR_PATCH), p.dtype)
    for i in range(7):
        out = out + k[i] * acc[:, i : i + _BLUR_PATCH, :]
    return out


def _orient_and_describe_at(atlas: jnp.ndarray, corner: jnp.ndarray):
    """Batched orientation + descriptor from pre-padded atlas patch corners.

    corner: (N, 2) int32 (row, col) of each keypoint's 47x47 patch origin;
    the keypoint sits at the static patch center. Gathers one contiguous
    patch per keypoint (Pallas DMA on TPU, see ops/patches.py), computes the
    intensity-centroid angle (IC_Angle, ORBextractor.cc:84-128) with static
    circular-mask moments, Gaussian-blurs the patch batch (the reference
    blurs the whole level, ORBextractor.cc:1300 — identical on the patch
    interior), and samples the 512 steered-BRIEF points
    (computeOrbDescriptor, ORBextractor.cc:141-192) with one-hot matmuls.
    """
    n = corner.shape[0]
    praw = gather_patches(atlas, corner)
    m10 = jnp.sum(praw * _M10[None], axis=(1, 2))
    m01 = jnp.sum(praw * _M01[None], axis=(1, 2))
    angle = jnp.arctan2(m01, m10)

    # Rounding the blurred patch to integers mirrors the reference, which
    # Gaussian-blurs an 8-bit image into an 8-bit image
    # (ORBextractor.cc:1300-1315) — and makes every pixel value exactly
    # representable in bfloat16 (integers 0..255), so the one-hot sampling
    # matmuls below are bit-exact in a single bf16 MXU pass.
    from tpuslam.ops.patches import _use_pallas

    on_tpu = _use_pallas()
    pblur = jnp.round(_blur_patches(praw))
    pblur = pblur.astype(jnp.bfloat16 if on_tpu else jnp.float32)
    pat = jnp.asarray(BRIEF_PATTERN, dtype=jnp.float32)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    px = pat[None, :, :, 0]
    py = pat[None, :, :, 1]
    cols = jnp.round(px * ca[:, None, None] - py * sa[:, None, None]).astype(jnp.int32)
    rows = jnp.round(px * sa[:, None, None] + py * ca[:, None, None]).astype(jnp.int32)
    r = (rows + _CENTER_BLUR).reshape(n, 2 * _N_PAIRS)
    c = (cols + _CENTER_BLUR).reshape(n, 2 * _N_PAIRS)
    if on_tpu:
        # Sample the 512 rotated pattern points with a one-hot row matmul
        # (MXU) followed by a one-hot column weighted reduce (VPU) — 7x
        # faster on TPU than a within-patch take_along_axis gather, and
        # exact (each output sums exactly one integer-valued product).
        i_blur = jnp.arange(_BLUR_PATCH)
        row_onehot = (r[..., None] == i_blur).astype(jnp.bfloat16)
        t = jax.lax.dot_general(
            row_onehot, pblur, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (N, 512, 41) = pblur rows per sample row
        vals = jnp.sum(
            t * (c[..., None] == i_blur).astype(jnp.bfloat16), axis=-1,
            dtype=jnp.float32,
        ).reshape(n, _N_PAIRS, 2)
    else:
        # Off-TPU the ~1.7 GMAC of one-hot matmuls run as emulated-bf16
        # GEMMs and dominate the whole frame (~300 ms of the measured
        # 430 ms CPU track latency); a direct batched gather is the
        # CPU-native form of the same exact sampling.
        vals = pblur[jnp.arange(n)[:, None], r, c].reshape(n, _N_PAIRS, 2)
    bits = (vals[:, :, 0] < vals[:, :, 1]).astype(jnp.uint32).reshape(n, 8, 32)
    desc = jnp.sum(
        bits << jnp.arange(32, dtype=jnp.uint32)[None, None, :], axis=-1, dtype=jnp.uint32
    )
    return angle, desc



def build_patch_atlas(levels):
    """Single-pyramid uint8 patch atlas: per-level edge-padded blocks
    stacked row-wise (the layout gather_patches consumes — shared by the
    descriptor stage and the stereo SAD refinement). Returns
    (atlas (Ha, Wa) uint8, row_offsets (n_levels,) np.int32, Wa)."""
    W_atlas = levels[0].shape[1] + 2 * _PAD
    rows, offs, off = [], [], 0
    for lvl in levels:
        blk = jnp.pad(lvl, _PAD, mode="edge")
        blk = jnp.pad(blk, ((0, 0), (0, W_atlas - blk.shape[1])))
        blk = jnp.clip(jnp.round(blk), 0.0, 255.0).astype(jnp.uint8)
        rows.append(blk)
        offs.append(off)
        off += blk.shape[0]
    return jnp.concatenate(rows, axis=0), np.asarray(offs, np.int32), W_atlas


def extract_orb_batched(imgs: jnp.ndarray, config: ORBConfig) -> ORBFeatures:
    """ORB extraction for a batch of grayscale images (B, H, W) in [0, 255].

    Equivalent of ORBextractor::operator()
    (/root/reference/src/ORBextractor.cc:1248) over B independent streams:
    pyramid, per-level FAST + uniform selection, then ONE fused
    orientation+descriptor pass over all levels AND all streams — the
    per-level edge-padded images of every stream are stacked into a single
    atlas so the patch gather, moments, blur, and BRIEF sampling run as one
    batch of B * config.n_features keypoints. Multi-stream batching is the
    frames/s/chip lever: the tiny-op chains amortize their fixed per-op cost
    across streams. Output arrays are (B, n_features, ...) with a validity
    mask; coordinates are level-0.
    """
    B = imgs.shape[0]
    levels = jax.vmap(
        lambda im: build_pyramid(im, config.n_levels, config.scale_factor)
    )(imgs)  # list over levels of (B, H_l, W_l)
    budgets = config.level_budgets()
    scales = config.level_scales()

    xs, resps, valids, lvls, corners = [], [], [], [], []
    atlas_blocks = []
    row_off = 0
    W_atlas = levels[0].shape[2] + 2 * _PAD
    for l, (lvl_imgs, n_l) in enumerate(zip(levels, budgets)):
        if n_l <= 0:
            continue
        score = fast_nms(lvl_imgs, config.min_th_fast)  # (B, H_l, W_l)
        xy, resp, valid = jax.vmap(
            lambda s: _select_level_keypoints(
                s, n_l, config.cell_size, config.ini_th_fast
            )
        )(score)  # (B, n_l, 2), (B, n_l), (B, n_l)
        # Edge-padded level block appended to the atlas; detection-border
        # margins guarantee every 47x47 patch stays inside its own block.
        # The atlas is stored as uint8 (the reference's images are 8-bit,
        # ORBextractor.cc works on 8U Mats) — 4x less patch-gather DMA
        # traffic; see ops/patches.py.
        blk = jnp.pad(lvl_imgs, ((0, 0), (_PAD, _PAD), (_PAD, _PAD)), mode="edge")
        blk = jnp.pad(blk, ((0, 0), (0, 0), (0, W_atlas - blk.shape[2])))
        blk = jnp.clip(jnp.round(blk), 0.0, 255.0).astype(jnp.uint8)
        atlas_blocks.append(blk)
        cy = jnp.clip(xy[..., 1] + _PAD - _CENTER_RAW + row_off, 0, None)
        cx = jnp.clip(xy[..., 0] + _PAD - _CENTER_RAW, 0, None)
        corners.append(jnp.stack([cy, cx], axis=-1))
        row_off += blk.shape[1]
        xs.append(xy.astype(jnp.float32) * scales[l])
        resps.append(resp)
        valids.append(valid)
        lvls.append(jnp.full((B, n_l), l, dtype=jnp.int32))

    # Stream-major atlas: stream b's levels live in rows [b*Ha, (b+1)*Ha).
    atlas = jnp.concatenate(atlas_blocks, axis=1)  # (B, Ha, Wa)
    Ha = atlas.shape[1]
    atlas = atlas.reshape(B * Ha, W_atlas)
    corner = jnp.concatenate(corners, axis=1)  # (B, N, 2)
    stream_off = (jnp.arange(B, dtype=jnp.int32) * Ha)[:, None]
    corner = corner.at[..., 0].add(stream_off)
    n = corner.shape[1]
    angle, desc = _orient_and_describe_at(atlas, corner.reshape(B * n, 2))

    return ORBFeatures(
        xy=jnp.concatenate(xs, axis=1),
        response=jnp.concatenate(resps, axis=1),
        angle=angle.reshape(B, n),
        level=jnp.concatenate(lvls, axis=1),
        desc=desc.reshape(B, n, 8),
        valid=jnp.concatenate(valids, axis=1),
    )


def extract_orb(img: jnp.ndarray, config: ORBConfig) -> ORBFeatures:
    """Full ORB extraction for one grayscale image (H, W) float32 in [0, 255].

    Single-stream view of extract_orb_batched (B = 1)."""
    f = extract_orb_batched(img[None], config)
    return ORBFeatures(*(leaf[0] for leaf in f))
