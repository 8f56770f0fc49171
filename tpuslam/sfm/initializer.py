"""Monocular two-view initialization: parallel H/F RANSAC + reconstruction.

TPU-native re-design of the reference's Initializer
(/root/reference/src/Initializer.cc): where the reference runs two threads
(FindHomography / FindFundamental, :128-134) each looping over 200
pre-sampled 8-point sets, here BOTH models over ALL hypotheses are one
vmapped batch: normalized DLT homographies (ComputeH21 :333) and 8-point
fundamentals (ComputeF21 :393) are solved with batched eigendecompositions
of the 9x9 normal matrices, scored with the reference's symmetric-transfer /
epipolar chi2 scores (CheckHomography :451, CheckFundamental :579), the
model is chosen by RH = SH/(SH+SF) > 0.40 (:138-156), and motion is
recovered by testing all candidate (R, t) decompositions (ReconstructF :692
with DecomposeE :1280; ReconstructH :811 via the Faugeras 1988 SVD cases)
with the cheirality/parallax/reprojection vetting of CheckRT (:1123).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry.triangulation import triangulate_dlt

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_CAP = 5.991  # both scores accumulate (cap - chi2), Initializer.cc:545,655


class TwoViewResult(NamedTuple):
    success: jnp.ndarray     # () bool
    R: jnp.ndarray           # (3, 3) world(frame1)->frame2
    t: jnp.ndarray           # (3,) unit-norm translation
    points: jnp.ndarray      # (N, 3) triangulated in frame-1 coords
    is_h: jnp.ndarray        # () bool — which model won
    inliers: jnp.ndarray     # (N,) bool — triangulated good points
    n_good: jnp.ndarray      # () int32


def _normalize(xy: jnp.ndarray, valid: jnp.ndarray):
    """Mean-0 / mean-abs-dev-1 normalization (Initializer::Normalize :965)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    d = jnp.abs(xy - mean) * w[:, None]
    md = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(md, 1e-8)
    xn = (xy - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return xn, T


def _dlt_homography(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """H from 8 normalized correspondences, (8,2)x(8,2) -> (3,3).

    Standard DLT: each pair gives two rows; solve the smallest eigenvector
    of A^T A (9x9) — batched-eigh-friendly, equivalent nullspace to the
    reference's SVD (ComputeH21, Initializer.cc:333)."""
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (16, 9)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[:, 0].reshape(3, 3)


def _eight_point_F(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """F from 8 normalized correspondences with rank-2 enforcement
    (ComputeF21, Initializer.cc:393)."""
    u1, v1 = p1[:, 0], p1[:, 1]
    u2, v2 = p2[:, 0], p2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )  # (8, 9)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    F = vecs[:, 0].reshape(3, 3)
    # Rank-2: zero the smallest singular value.
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt


def _score_homography(H21, H12, xy1, xy2, valid, sigma2: float):
    """Symmetric transfer score (CheckHomography, Initializer.cc:451).

    Returns (score, inlier_mask)."""
    def transfer(H, a, b):
        x, y = a[:, 0], a[:, 1]
        den = H[2, 0] * x + H[2, 1] * y + H[2, 2]
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        u = (H[0, 0] * x + H[0, 1] * y + H[0, 2]) / den
        v = (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / den
        return ((b[:, 0] - u) ** 2 + (b[:, 1] - v) ** 2) / sigma2

    c1 = transfer(H12, xy2, xy1)  # project 2 into 1
    c2 = transfer(H21, xy1, xy2)
    in1 = c1 <= CHI2_H
    in2 = c2 <= CHI2_H
    score = jnp.sum(
        jnp.where(valid & in1, SCORE_CAP - c1, 0.0)
        + jnp.where(valid & in2, SCORE_CAP - c2, 0.0)
    )
    return score, valid & in1 & in2


def _score_fundamental(F21, xy1, xy2, valid, sigma2: float):
    """Epipolar-distance score (CheckFundamental, Initializer.cc:579)."""
    x1 = jnp.concatenate([xy1, jnp.ones_like(xy1[:, :1])], axis=-1)
    x2 = jnp.concatenate([xy2, jnp.ones_like(xy2[:, :1])], axis=-1)
    l2 = x1 @ F21.T  # epipolar lines in image 2: (a, b, c)
    num2 = jnp.sum(l2 * x2, axis=-1)
    c1 = num2 * num2 / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12) / sigma2
    l1 = x2 @ F21  # lines in image 1
    num1 = jnp.sum(l1 * x1, axis=-1)
    c2 = num1 * num1 / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12) / sigma2
    in1 = c1 <= CHI2_F
    in2 = c2 <= CHI2_F
    score = jnp.sum(
        jnp.where(valid & in1, SCORE_CAP - c1, 0.0)
        + jnp.where(valid & in2, SCORE_CAP - c2, 0.0)
    )
    return score, valid & in1 & in2


def _check_rt(R, t, K, xy1, xy2, valid, sigma2: float):
    """Vet one (R, t) hypothesis (CheckRT, Initializer.cc:1123): triangulate
    every valid match, count points with positive depth in both views,
    parallax, and reprojection chi2 < 4 sigma2 in both images.

    Returns (n_good, parallax_deg, good_mask, points3d)."""
    n = xy1.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
    zero = jnp.zeros((n, 3))
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X, w = triangulate_dlt(
        jnp.broadcast_to(P1, (n, 3, 4)), jnp.broadcast_to(P2, (n, 3, 4)), xy1, xy2
    )
    finite = jnp.all(jnp.isfinite(X), axis=-1) & (jnp.abs(w) > 1e-9)

    # Parallax between the two rays.
    o2 = -R.T @ t  # camera-2 center in frame 1
    r1 = X
    r2 = X - o2
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )

    z1 = X[:, 2]
    Xc2 = (R @ X[..., None])[..., 0] + t
    z2 = Xc2[:, 2]
    # Cheirality: positive depth in both views; allow low-parallax points to
    # fail depth (the reference only applies the check when cosParallax<0.99998).
    depth_ok = (z1 > 0) & (z2 > 0) | (cosp >= 0.99998)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u1 = fx * X[:, 0] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1) + cx
    v1 = fy * X[:, 1] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1) + cy
    u2 = fx * Xc2[:, 0] / jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2) + cx
    v2 = fy * Xc2[:, 1] / jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2) + cy
    e1 = (u1 - xy1[:, 0]) ** 2 + (v1 - xy1[:, 1]) ** 2
    e2 = (u2 - xy2[:, 0]) ** 2 + (v2 - xy2[:, 1]) ** 2
    reproj_ok = (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2)

    good = valid & finite & depth_ok & reproj_ok & (z1 > 0) & (z2 > 0)
    n_good = jnp.sum(good.astype(jnp.int32))

    # Parallax statistic: the reference takes the 50th-best parallax among
    # good points (Initializer.cc:1216-1223). Use the 50th-smallest cos
    # (i.e. largest parallax are sorted first... cos ascending = parallax
    # descending); guard small counts.
    cosp_good = jnp.where(good, cosp, 1.0)
    sorted_cos = jnp.sort(cosp_good)  # ascending: best parallax first
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax_cos = sorted_cos[idx]
    parallax_deg = jnp.rad2deg(jnp.arccos(jnp.clip(parallax_cos, -1.0, 1.0)))
    return n_good, parallax_deg, good, X


def _decompose_E(E: jnp.ndarray):
    """E -> 4 (R, t) candidates (DecomposeE, Initializer.cc:1280)."""
    U, _, Vt = jnp.linalg.svd(E)
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = U @ W.T @ Vt
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_H(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras-style homography decomposition -> 8 (R, t) candidates
    (ReconstructH, Initializer.cc:811). A = K^-1 H K; SVD A = U diag(d) V^T;
    the d1 != d2 != d3 case yields 4 solutions for d' = d2 and 4 for
    d' = -d2."""
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = d[0], d[1], d[2]

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / denom, 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / denom, 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # Case d' = +d2.
    sin_t = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    eps = jnp.array([1.0, -1.0, -1.0, 1.0])

    def make_pos(x1, x3, e):
        st = e * sin_t
        Rp = jnp.array(
            [[cos_t, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, cos_t]]
        )
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1, 0.0, -x3]) * (d1 - d3)
        t = U @ tp
        return R, t

    # Case d' = -d2.
    sin_p = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)

    def make_neg(x1, x3, e):
        sp = e * sin_p
        Rp = jnp.array(
            [[cos_p, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cos_p]]
        )
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1, 0.0, x3]) * (d1 + d3)
        t = U @ tp
        return R, t

    Rs, ts = [], []
    for i in range(4):
        R, t = make_pos(x1s[i], x3s[i], eps[i])
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    for i in range(4):
        R, t = make_neg(x1s[i], x3s[i], eps[i])
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


def _refit_homography(xn1, xn2, T1, T2inv, inl):
    """Weighted DLT homography over all inlier correspondences."""
    w = jnp.sqrt(inl.astype(jnp.float32))
    u1, v1 = xn1[:, 0], xn1[:, 1]
    u2, v2 = xn2[:, 0], xn2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    Hn = vecs[:, 0].reshape(3, 3)
    H21 = T2inv @ Hn @ T1
    return H21 / jnp.where(jnp.abs(H21[2, 2]) < 1e-12, 1e-12, H21[2, 2])


def _refit_fundamental(xn1, xn2, T1, T2, inl):
    """Weighted 8-point fundamental over all inlier correspondences."""
    w = jnp.sqrt(inl.astype(jnp.float32))
    u1, v1 = xn1[:, 0], xn1[:, 1]
    u2, v2 = xn2[:, 0], xn2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    ) * w[:, None]
    _, vecs = jnp.linalg.eigh(A.T @ A)
    F = vecs[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return T2.T @ (U @ jnp.diag(S) @ Vt) @ T1


def initialize_two_view(
    key: jax.Array,
    K: jnp.ndarray,
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    n_hypotheses: int = 200,
    sigma: float = 1.0,
    min_parallax_deg: float = 1.0,
    min_triangulated: int = 50,
) -> TwoViewResult:
    """Full monocular bootstrap from matched undistorted pixel pairs.

    xy1/xy2: (N, 2) matched coordinates (invalid rows arbitrary); valid: (N,).
    Mirrors Initializer::Initialize (/root/reference/src/Initializer.cc:45)
    with both models fit and scored in one vmapped batch.
    """
    sigma2 = sigma * sigma
    n = xy1.shape[0]
    xn1, T1 = _normalize(xy1, valid)
    xn2, T2 = _normalize(xy2, valid)
    T2inv = jnp.linalg.inv(T2)

    # Pre-sample 8-point sets from valid indices (with replacement across
    # sets, without within a set — like DUtils::Random usage at :88-120).
    valid_idx = jnp.argsort(~valid)  # valid first
    n_valid = jnp.sum(valid.astype(jnp.int32))
    picks = jax.random.randint(
        key, (n_hypotheses, 8), 0, jnp.maximum(n_valid, 8)
    )
    sets = valid_idx[picks]  # (200, 8)

    def fit_one(idx8):
        p1 = xn1[idx8]
        p2 = xn2[idx8]
        Hn = _dlt_homography(p1, p2)
        Fn = _eight_point_F(p1, p2)
        H21 = T2inv @ Hn @ T1
        H21 = H21 / jnp.where(jnp.abs(H21[2, 2]) < 1e-12, 1e-12, H21[2, 2])
        F21 = T2.T @ Fn @ T1
        return H21, F21

    H_all, F_all = jax.vmap(fit_one)(sets)

    def score_h(H):
        Hinv = jnp.linalg.inv(H)
        s, _ = _score_homography(H, Hinv, xy1, xy2, valid, sigma2)
        return s

    def score_f(F):
        s, _ = _score_fundamental(F, xy1, xy2, valid, sigma2)
        return s

    SH_all = jax.vmap(score_h)(H_all)
    SF_all = jax.vmap(score_f)(F_all)
    bh = jnp.argmax(SH_all)
    bf = jnp.argmax(SF_all)
    H_best = H_all[bh]
    F_best = F_all[bf]
    SH = SH_all[bh]
    SF = SF_all[bf]

    rh = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = rh > 0.40  # Initializer.cc:152

    _, h_inl = _score_homography(H_best, jnp.linalg.inv(H_best), xy1, xy2, valid, sigma2)
    _, f_inl = _score_fundamental(F_best, xy1, xy2, valid, sigma2)

    # Improvement over the reference: re-fit the winning model on ALL its
    # inliers (weighted DLT) before decomposition. A minimal 8-point estimate
    # carries several degrees of direction error at 0.5 px noise; the
    # all-inlier refit brings reconstruction quality to the full-sample
    # Cramer-Rao level at the cost of one more 9x9 eigendecomposition.
    H_best = _refit_homography(xn1, xn2, T1, T2inv, h_inl)
    F_best = _refit_fundamental(xn1, xn2, T1, T2, f_inl)
    _, h_inl = _score_homography(H_best, jnp.linalg.inv(H_best), xy1, xy2, valid, sigma2)
    _, f_inl = _score_fundamental(F_best, xy1, xy2, valid, sigma2)
    model_inl = jnp.where(use_h, h_inl, f_inl)

    # Candidate motions from both models; select by the winning model's mask.
    E = K.T @ F_best @ K
    Rs_f, ts_f = _decompose_E(E)
    # Pad F's 4 candidates to 8 (matching H's count) with degenerate
    # zero-baseline hypotheses that triangulate nothing — NOT repeats, which
    # would defeat the best-vs-second distinctness test below.
    Rs_f = jnp.concatenate([Rs_f, jnp.broadcast_to(jnp.eye(3), (4, 3, 3))], axis=0)
    ts_f = jnp.concatenate([ts_f, jnp.zeros((4, 3))], axis=0)
    Rs_h, ts_h = _decompose_H(H_best, K)
    Rs = jnp.where(use_h, Rs_h, Rs_f)
    ts = jnp.where(use_h, ts_h, ts_f)

    n_good, par, good, X = jax.vmap(
        lambda R, t: _check_rt(R, t, K, xy1, xy2, model_inl, sigma2)
    )(Rs, ts)

    best = jnp.argmax(n_good)
    n_best = n_good[best]
    # Distinctness: no other hypothesis within 0.75x of the best
    # (Initializer.cc:760-800: nsimilar>1 => reject).
    n_second = jnp.sort(n_good)[-2]
    distinct = n_second.astype(jnp.float32) < 0.75 * n_best.astype(jnp.float32)

    n_inliers = jnp.sum(model_inl.astype(jnp.int32))
    enough = n_best >= jnp.maximum(
        jnp.int32(min_triangulated), (0.9 * n_inliers).astype(jnp.int32)
    )
    parallax_ok = par[best] > min_parallax_deg

    success = distinct & enough & parallax_ok & (n_inliers >= 8)
    return TwoViewResult(
        success=success,
        R=Rs[best],
        t=ts[best],
        points=X[best],
        is_h=use_h,
        inliers=good[best],
        n_good=n_best,
    )
