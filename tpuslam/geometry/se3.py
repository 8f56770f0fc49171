"""SO(3)/SE(3) Lie-group operations, batched and jit-safe.

Fills the role of the reference's g2o SE3Quat type
(/root/reference/Thirdparty/g2o/g2o/types/se3quat.h) but as pure functional
tensor ops: rotations are 3x3 matrices, rigid transforms are (R, t) pairs
with the ORB-SLAM2 convention T_cw: x_cam = R @ x_world + t.

All functions broadcast over arbitrary leading batch dimensions and are
numerically safe at the theta -> 0 singularity via Taylor guards (needed for
stable gradients under jit).
"""

from __future__ import annotations

import jax.numpy as jnp

# Angle below which Taylor expansions replace the closed forms.
_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]x from (..., 3) axis vectors -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def _sinc_factors(theta_sq: jnp.ndarray):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3), Taylor-safe.

    theta_sq: (...,) squared rotation angle.
    """
    small = theta_sq < _EPS
    # Guard BEFORE the sqrt: d(sqrt)/dx is infinite at 0, and jnp.where does
    # not stop NaN gradients from the untaken branch.
    safe_tsq = jnp.where(small, 1.0, theta_sq)
    safe_t = jnp.sqrt(safe_tsq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_t)) / safe_tsq)
    c = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0, (safe_t - jnp.sin(safe_t)) / (safe_tsq * safe_t)
    )
    return a, b, c


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle (..., 3) -> rotation matrices (..., 3, 3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_factors(theta_sq)
    K = hat(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3).

    Handles theta near 0 (Taylor) and theta near pi (diagonal extraction).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # Antisymmetric part gives 2 * sin(theta) * axis.
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # atan2 form is well-conditioned everywhere except theta ~ pi (handled
    # below); arccos of the trace loses ~3 digits in float32. The sqrt in
    # |v| is guarded BEFORE evaluation so gradients at the identity stay
    # finite (jnp.where does not block NaN grads of the untaken branch).
    vv = jnp.sum(v * v, axis=-1)
    near_zero = vv < 1e-10
    safe_vv = jnp.where(near_zero, 1.0, vv)
    sin_theta = 0.5 * jnp.sqrt(safe_vv)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arctan2(sin_theta, cos_theta)
    near_pi = (jnp.pi - theta < 1e-4) & ~near_zero

    # Generic: w = theta / (2 sin theta) * v. Near zero: |v| ~ 2 theta, so
    # theta^2 ~ vv/4 and w = (0.5 + theta^2/12) v = (0.5 + vv/48) v — a
    # polynomial in v with well-defined derivatives at v = 0.
    safe_sin = jnp.where(near_zero | near_pi, 1.0, sin_theta)
    scale = jnp.where(near_zero, 0.5 + vv / 48.0, theta / (2.0 * safe_sin))
    w_generic = scale[..., None] * v

    # Near pi: axis from the largest diagonal of (R + I) / 2 = aa^T approx.
    B = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    axis_cols = jnp.take_along_axis(jnp.swapaxes(B, -1, -2), k[..., None, None], axis=-2)[..., 0, :]
    denom = jnp.sqrt(jnp.maximum(jnp.take_along_axis(diag, k[..., None], axis=-1)[..., 0], 1e-12))
    axis = axis_cols / denom[..., None]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    # Fix the sign so it matches the antisymmetric part.
    sign = jnp.where(jnp.sum(axis * v, axis=-1) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign[..., None]

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def se3_exp(xi: jnp.ndarray):
    """Twist (..., 6) [omega, v] -> (R (..., 3, 3), t (..., 3)).

    Same exponential as g2o::SE3Quat::exp
    (/root/reference/Thirdparty/g2o/g2o/types/se3quat.h:204-257): t = V v with
    the left-Jacobian V of SO(3).
    """
    w, v = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, c = _sinc_factors(theta_sq)
    K = hat(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + a[..., None, None] * K + b[..., None, None] * KK
    V = eye + b[..., None, None] * K + c[..., None, None] * KK
    t = (V @ v[..., None])[..., 0]
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> twist (..., 6) [omega, v], inverse of se3_exp."""
    w = so3_log(R)
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_factors(theta_sq)
    K = hat(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), K.shape)
    # V^{-1} = I - K/2 + coef * K^2, coef = (1 - A/(2B)) / theta^2.
    small = theta_sq < _EPS
    safe_tsq = jnp.where(small, 1.0, theta_sq)
    coef = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, (1.0 - a / (2.0 * b)) / safe_tsq)
    Vinv = eye - 0.5 * K + coef[..., None, None] * KK
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def so3_project(R: jnp.ndarray) -> jnp.ndarray:
    """Project near-rotations back onto SO(3) (batched 3x3).

    Float32 matrix storage slowly denormalizes rotations, and two paths
    AMPLIFY any deviation instead of preserving it: inverse-by-transpose
    (se3_inverse: R^T is not R^-1 once R R^T != I, doubling the error) and
    the tracker's velocity chain (predict -> optimize -> compose, once per
    frame). Left unchecked the error compounds exponentially — observed in
    practice as det(R) collapsing from 0.999 to 0.30 over ~30 frames of
    sparse-keyframe mono tracking. g2o never meets this because SE3Quat
    stores unit quaternions (renormalized every update); matrix-form SE(3)
    needs an explicit projection at the optimizer boundaries instead.

    Newton-Schulz polar iteration (X <- X (3I - X^T X) / 2) rather than an
    SVD: polynomial in R, so it is differentiable everywhere (an SVD-based
    projection has NaN gradients exactly in the common case here — repeated
    singular values ~1), it batches onto the MXU as 3x3 matmuls, and it
    converges quadratically to the orthogonal polar factor for singular
    values in (0, sqrt(3)). Drift at the call sites is <1e-3 per call, so
    three iterations reach float32 roundoff.
    """
    X = R
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    for _ in range(3):
        X = 0.5 * X @ (3.0 * eye - jnp.swapaxes(X, -1, -2) @ X)
    return X


def se3_compose(R1, t1, R2, t2):
    """T1 * T2: first apply T2, then T1 (matrix convention)."""
    return R1 @ R2, (R1 @ t2[..., None])[..., 0] + t1


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_apply(R, t, x):
    """Apply transform to points x (..., 3)."""
    return (R @ x[..., None])[..., 0] + t


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) [x, y, z, w] -> rotation matrix (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) [x, y, z, w].

    Branch-free Shepperd's method: computes all four candidate quaternions and
    selects the best-conditioned one (jit-safe, no data-dependent control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Candidate 0: w dominant.
    s0 = _safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], axis=-1)
    # Candidate 1: x dominant.
    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], axis=-1)
    # Candidate 2: y dominant.
    s2 = _safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], axis=-1)
    # Candidate 3: z dominant.
    s3 = _safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], axis=-1)

    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(qs, idx[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0.0, -1.0, 1.0)
