"""Horn closed-form Sim3 absolute orientation + vmapped RANSAC.

TPU-native re-design of the reference's Sim3Solver
(/root/reference/src/Sim3Solver.cc): the sequential 3-point RANSAC
(iterate :140) becomes a vmapped hypothesis batch; each hypothesis runs
Horn's 1987 quaternion method (ComputeSim3 :226-337 — centroid removal, the
4x4 N matrix, its dominant eigenvector as the rotation quaternion) with
optional scale (:292-311, fixed to 1 for stereo/RGB-D), and inliers are
counted by mutual reprojection into both cameras (CheckInliers :340).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry.se3 import quat_to_rotmat


def horn_sim3(P1: jnp.ndarray, P2: jnp.ndarray, w: jnp.ndarray, fix_scale: bool = False):
    """Closed-form similarity: find (s, R, t) with P2 ~ s R P1 + t.

    P1, P2: (n, 3); w: (n,) weights. Horn 1987 quaternion method.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.sum(P1 * w[:, None], axis=0) / wsum
    c2 = jnp.sum(P2 * w[:, None], axis=0) / wsum
    A = (P1 - c1) * w[:, None]
    B = P2 - c2
    M = A.T @ B  # (3, 3) = sum p1' p2'^T

    sxx, sxy, sxz = M[0, 0], M[0, 1], M[0, 2]
    syx, syy, syz = M[1, 0], M[1, 1], M[1, 2]
    szx, szy, szz = M[2, 0], M[2, 1], M[2, 2]
    # Horn's 4x4 N matrix (quaternion order (w, x, y, z) internally).
    N = jnp.array(
        [
            [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
            [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
            [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
            [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
        ]
    )
    eigval, eigvec = jnp.linalg.eigh(N)
    q_wxyz = eigvec[:, 3]  # largest eigenvalue
    q = jnp.array([q_wxyz[1], q_wxyz[2], q_wxyz[3], q_wxyz[0]])  # -> (x, y, z, w)
    R = quat_to_rotmat(q)

    # Scale (Horn's symmetric form is sqrt(S2/S1); the reference uses
    # dot(P2', R P1') / |P1'|^2 (Sim3Solver.cc:292-311) — use the latter).
    RP1 = ((P1 - c1) @ R.T) * 1.0
    num = jnp.sum(B * RP1 * w[:, None])
    den = jnp.maximum(jnp.sum(((P1 - c1) ** 2) * w[:, None]), 1e-12)
    s = num / den
    s = jnp.where(fix_scale, 1.0, s)
    s = jnp.maximum(s, 1e-6)
    t = c2 - s * (R @ c1)
    return s, R, t


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    s: jnp.ndarray
    R: jnp.ndarray          # rotation 1 -> 2
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def sim3_chi2_inliers(K, s, R, t, X1, X2, uv1, uv2, chi2_1, chi2_2, valid):
    """Mutual-reprojection chi2 inlier mask for a Sim3 S21
    (Sim3Solver::CheckInliers, /root/reference/src/Sim3Solver.cc:340):
    project X1 through S21 against uv2 and X2 through S21^-1 against uv1;
    inlier iff both squared errors clear their chi2 gates."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def project(P):
        z = jnp.where(jnp.abs(P[:, 2]) < 1e-9, 1e-9, P[:, 2])
        return jnp.stack([fx * P[:, 0] / z + cx, fy * P[:, 1] / z + cy], axis=-1)

    X1in2 = s * (X1 @ R.T) + t
    e2 = jnp.sum((project(X1in2) - uv2) ** 2, axis=-1)
    sinv = 1.0 / s
    Rinv = R.T
    tinv = -sinv * (Rinv @ t)
    X2in1 = sinv * (X2 @ Rinv.T) + tinv
    e1 = jnp.sum((project(X2in1) - uv1) ** 2, axis=-1)
    return valid & (e1 < chi2_1) & (e2 < chi2_2)


def sim3_ransac(
    key: jax.Array,
    K: jnp.ndarray,
    X1: jnp.ndarray,
    X2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    chi2_1: jnp.ndarray,
    chi2_2: jnp.ndarray,
    valid: jnp.ndarray,
    fix_scale: bool = False,
    n_hypotheses: int = 128,
    min_inliers: int = 20,
) -> Sim3Result:
    """RANSAC Sim3 between two keyframes' matched camera-frame points.

    X1/X2: (N, 3) camera-frame coordinates of matched map points in KF1/KF2;
    uv1/uv2: their observed pixels; chi2_1/chi2_2: per-point chi2 gates
    (9.210 x sigma2 in the reference, Sim3Solver.cc:55-72). Returns the
    transform S21 mapping camera-1 coords to camera-2 coords.
    """
    n = X1.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    valid_idx = jnp.argsort(~valid)
    picks = jax.random.randint(key, (n_hypotheses, 3), 0, jnp.maximum(n_valid, 3))
    sets = valid_idx[picks]

    def count_inliers(s, R, t):
        return sim3_chi2_inliers(K, s, R, t, X1, X2, uv1, uv2, chi2_1, chi2_2, valid)

    def try_one(idx3):
        w3 = jnp.zeros(n).at[idx3].set(1.0)
        s, R, t = horn_sim3(X1, X2, w3, fix_scale)
        inl = count_inliers(s, R, t)
        return jnp.sum(inl.astype(jnp.int32)), s, R, t

    counts, ss, Rs, ts = jax.vmap(try_one)(sets)
    best = jnp.argmax(counts)
    s, R, t = ss[best], Rs[best], ts[best]
    inl = count_inliers(s, R, t)

    # Refine on inliers.
    s2, R2, t2 = horn_sim3(X1, X2, inl.astype(jnp.float32) + 1e-9, fix_scale)
    inl2 = count_inliers(s2, R2, t2)
    better = jnp.sum(inl2.astype(jnp.int32)) >= jnp.sum(inl.astype(jnp.int32))
    s = jnp.where(better, s2, s)
    R = jnp.where(better, R2, R)
    t = jnp.where(better, t2, t)
    inliers = jnp.where(better, inl2, inl)
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    return Sim3Result(n_inl >= min_inliers, s, R, t, inliers, n_inl)


def optimize_sim3(
    K: jnp.ndarray,
    s0: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    X1: jnp.ndarray,
    X2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    fix_scale: bool = False,
    iters: int = 10,
    chi2_th: float = 9.9999,
):
    """Gauss-Newton refinement of a relative Sim3 with bidirectional
    reprojection residuals (Optimizer::OptimizeSim3,
    /root/reference/src/Optimizer.cc:1046): edge pairs project X1 into
    camera 2 through S21 and X2 into camera 1 through S21^-1; outliers
    (chi2 > ~10, the reference's th2) are reclassified after a first half
    of the schedule like g2o's two-pass loop (:1146-1186).

    Returns (s, R, t, inliers, n_inliers).
    """
    from tpuslam.geometry.sim3 import sim3_exp, sim3_compose, sim3_inverse, sim3_apply

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def project(P):
        z = jnp.where(jnp.abs(P[:, 2]) < 1e-9, 1e-9, P[:, 2])
        return jnp.stack([fx * P[:, 0] / z + cx, fy * P[:, 1] / z + cy], axis=-1)

    def residuals(params, s, R, t):
        ds, dR, dt = sim3_exp(params)
        s_, R_, t_ = sim3_compose(ds, dR, dt, s, R, t)
        e2 = (project(sim3_apply(s_[None].repeat(X1.shape[0]), R_, t_, X1)) - uv2)
        si, Ri, ti = sim3_inverse(s_, R_, t_)
        e1 = (project(sim3_apply(si[None].repeat(X2.shape[0]), Ri, ti, X2)) - uv1)
        return e1, e2

    def chi2(params, s, R, t):
        e1, e2 = residuals(params, s, R, t)
        return (
            jnp.sum(e1 * e1, axis=-1) * inv_sigma2_1
            + jnp.sum(e2 * e2, axis=-1) * inv_sigma2_2
        )

    def gn_rounds(s, R, t, active, n_iters):
        def step(carry, _):
            s, R, t = carry
            zero = jnp.zeros(7)

            def flat_res(p):
                e1, e2 = residuals(p, s, R, t)
                w1 = jnp.sqrt(inv_sigma2_1 * active)
                w2 = jnp.sqrt(inv_sigma2_2 * active)
                return jnp.concatenate(
                    [(e1 * w1[:, None]).reshape(-1), (e2 * w2[:, None]).reshape(-1)]
                )

            r = flat_res(zero)
            J = jax.jacfwd(flat_res)(zero)  # (4N, 7)
            if fix_scale:
                J = J.at[:, 6].set(0.0)
            H = J.T @ J + 1e-6 * jnp.eye(7)
            dx = jnp.linalg.solve(H, -(J.T @ r))
            if fix_scale:
                dx = dx.at[6].set(0.0)
            ds, dR, dt = sim3_exp(dx)
            return sim3_compose(ds, dR, dt, s, R, t), None

        (s, R, t), _ = jax.lax.scan(step, (s, R, t), None, length=n_iters)
        return s, R, t

    active = valid.astype(jnp.float32)
    s, R, t = gn_rounds(s0, R0, t0, active, iters // 2)
    c = chi2(jnp.zeros(7), s, R, t)
    inliers = valid & (c <= chi2_th)
    s, R, t = gn_rounds(s, R, t, inliers.astype(jnp.float32), iters - iters // 2)
    c = chi2(jnp.zeros(7), s, R, t)
    inliers = valid & (c <= chi2_th)
    return s, R, t, inliers, jnp.sum(inliers.astype(jnp.int32))
