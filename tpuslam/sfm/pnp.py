"""EPnP + RANSAC absolute pose from 3D-2D matches, fully batched.

TPU-native re-design of the reference's PnPsolver
(/root/reference/src/PnPsolver.cc): the adaptive sequential RANSAC
(iterate :165) becomes one vmapped batch of minimal 4-point EPnP solves —
control points via PCA (choose_control_points :375), barycentric coordinates
(:411), the 2n x 12 system solved through the eigenvectors of M^T M
(compute_pose :477-525), betas initialised from the single-vector case and
refined by Gauss-Newton on the 6 inter-control-point distance constraints
(gauss_newton :812), and R, t recovered by Kabsch/Horn absolute orientation
(estimate_R_and_t :569). Inliers are counted with per-point chi2 thresholds
like SetRansacParameters (:121-157); the winning hypothesis is refined with
EPnP on its full inlier set (Refine :260).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_CTRL_DIST_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _kabsch(Pw: jnp.ndarray, Pc: jnp.ndarray, w: jnp.ndarray):
    """Weighted absolute orientation: find R, t with Pc ~ R Pw + t."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    cw = jnp.sum(Pw * w[:, None], axis=0) / wsum
    cc = jnp.sum(Pc * w[:, None], axis=0) / wsum
    A = (Pw - cw) * w[:, None]
    B = Pc - cc
    Hm = A.T @ B
    U, _, Vt = jnp.linalg.svd(Hm)
    d = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * 1.0).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = cc - R @ cw
    return R, t


def _epnp(Pw: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray, fx, fy, cx, cy):
    """EPnP for one weighted point set. Pw: (n, 3), uv: (n, 2), w: (n,) weights
    (0 excludes a point). Returns (R, t)."""
    n = Pw.shape[0]
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(Pw * w[:, None], axis=0) / wsum
    centered = (Pw - c0) * jnp.sqrt(w)[:, None]
    cov = centered.T @ centered / wsum
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    # Control points: centroid + principal directions scaled by sqrt(var).
    scales = jnp.sqrt(jnp.maximum(eigval, 1e-12))
    ctrl_w = jnp.stack(
        [
            c0,
            c0 + scales[2] * eigvec[:, 2],
            c0 + scales[1] * eigvec[:, 1],
            c0 + scales[0] * eigvec[:, 0],
        ],
        axis=0,
    )  # (4, 3)

    # Barycentric coords: solve [c1-c0, c2-c0, c3-c0] a = p - c0.
    B = jnp.stack([ctrl_w[1] - ctrl_w[0], ctrl_w[2] - ctrl_w[0], ctrl_w[3] - ctrl_w[0]], axis=1)
    Binv = jnp.linalg.inv(B + 1e-12 * jnp.eye(3))
    a123 = (Binv @ (Pw - ctrl_w[0]).T).T  # (n, 3)
    alphas = jnp.concatenate([1.0 - jnp.sum(a123, axis=1, keepdims=True), a123], axis=1)

    # M (2n, 12), columns interleaved (x_j, y_j, z_j) per control point j.
    u, v = uv[:, 0], uv[:, 1]
    Zr = jnp.zeros((n, 4))
    mu = jnp.stack([alphas * fx, Zr, alphas * (cx - u)[:, None]], axis=-1).reshape(n, 12)
    mv = jnp.stack([Zr, alphas * fy, alphas * (cy - v)[:, None]], axis=-1).reshape(n, 12)
    M = jnp.concatenate([mu * jnp.sqrt(w)[:, None], mv * jnp.sqrt(w)[:, None]], axis=0)
    MtM = M.T @ M
    _, vecs = jnp.linalg.eigh(MtM)
    V = vecs[:, :4]  # 4 smallest (columns), v0 = smallest

    # Distances between world control points (rho).
    rho = jnp.array(
        [jnp.sum((ctrl_w[i] - ctrl_w[j]) ** 2) for i, j in _CTRL_DIST_PAIRS]
    )

    def ctrl_cam(betas):
        x = V @ betas  # (12,)
        return x.reshape(4, 3)

    def dists(betas):
        cc = ctrl_cam(betas)
        return jnp.array([jnp.sum((cc[i] - cc[j]) ** 2) for i, j in _CTRL_DIST_PAIRS])

    # Case N=1 init: x = beta * v0; beta from ratio of distances.
    v0 = V[:, 0].reshape(4, 3)
    d0 = jnp.array([jnp.sum((v0[i] - v0[j]) ** 2) for i, j in _CTRL_DIST_PAIRS])
    beta1 = jnp.sqrt(jnp.sum(rho * d0) / jnp.maximum(jnp.sum(d0 * d0), 1e-12))
    betas0 = jnp.array([beta1, 0.0, 0.0, 0.0])

    # Gauss-Newton on the 6 distance constraints (PnPsolver::gauss_newton).
    def gn_step(betas, _):
        J = jax.jacfwd(dists)(betas)  # (6, 4)
        r = dists(betas) - rho
        H = J.T @ J + 1e-9 * jnp.eye(4)
        step = jnp.linalg.solve(H, J.T @ r)
        return betas - step, None

    betas, _ = jax.lax.scan(gn_step, betas0, None, length=6)

    cc = ctrl_cam(betas)
    # Depth sign: points must be in front of the camera.
    Pc = alphas @ cc  # (n, 3)
    sign = jnp.where(jnp.sum(jnp.where(w > 0, jnp.sign(Pc[:, 2]), 0.0)) < 0, -1.0, 1.0)
    Pc = Pc * sign
    return _kabsch(Pw, Pc, w)


class PnPResult(NamedTuple):
    success: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def pnp_ransac(
    key: jax.Array,
    K: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    n_hypotheses: int = 128,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    """Vmapped minimal-EPnP RANSAC. pts_w: (N, 3), uv: (N, 2) undistorted.

    Per-point chi2 gates use inv_sigma2 (octave-dependent like
    PnPsolver::SetRansacParameters :151-156). The best hypothesis is refined
    with EPnP over its inliers.
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    n = pts_w.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    valid_idx = jnp.argsort(~valid)
    picks = jax.random.randint(key, (n_hypotheses, 4), 0, jnp.maximum(n_valid, 4))
    sets = valid_idx[picks]

    def reproj_chi2(R, t):
        p = (R @ pts_w[..., None])[..., 0] + t
        z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
        u = fx * p[:, 0] / z + cx
        v = fy * p[:, 1] / z + cy
        err = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        return err * inv_sigma2, p[:, 2] > 0

    def try_one(idx4):
        w4 = jnp.zeros(n).at[idx4].set(1.0)
        R, t = _epnp(pts_w, uv, w4, fx, fy, cx, cy)
        chi2, front = reproj_chi2(R, t)
        inl = valid & front & (chi2 <= chi2_th)
        return jnp.sum(inl.astype(jnp.int32)), R, t

    counts, Rs, ts = jax.vmap(try_one)(sets)
    best = jnp.argmax(counts)
    Rb, tb = Rs[best], ts[best]
    chi2, front = reproj_chi2(Rb, tb)
    inl = valid & front & (chi2 <= chi2_th)

    # Refine on the inlier set.
    w_inl = inl.astype(jnp.float32)
    Rr, tr = _epnp(pts_w, uv, w_inl + 1e-9, fx, fy, cx, cy)
    chi2_r, front_r = reproj_chi2(Rr, tr)
    inl_r = valid & front_r & (chi2_r <= chi2_th)
    better = jnp.sum(inl_r.astype(jnp.int32)) >= jnp.sum(inl.astype(jnp.int32))
    R = jnp.where(better, Rr, Rb)
    t = jnp.where(better, tr, tb)
    inliers = jnp.where(better, inl_r, inl)
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    return PnPResult(n_inl >= min_inliers, R, t, inliers, n_inl)
