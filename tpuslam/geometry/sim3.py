"""Sim(3) similarity transforms (s, R, t), batched and jit-safe.

Fills the role of g2o::Sim3 (/root/reference/Thirdparty/g2o/g2o/types/sim3.h)
for loop closing: x' = s * R @ x + t. Represented as a (s, R, t) tuple of
arrays so it composes with the SE3 helpers; the 7-vector tangent layout is
[omega(3), v(3), sigma(1)] with s = exp(sigma).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuslam.geometry.se3 import hat, so3_exp, so3_log, _sinc_factors

_EPS = 1e-8


def _sim3_W(w: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) 'W' matrix such that t = W @ v (Ethan Eade's notation).

    W = A_ * I + B_ * [w]x + C_ * [w]x^2 with coefficients depending on the
    rotation angle theta and the log-scale sigma, Taylor-guarded near both
    singularities.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    s = jnp.exp(sigma)

    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta_sq < 1e-10

    safe_sigma = jnp.where(small_sigma, 1.0, sigma)
    # Guard BEFORE the sqrt: the untaken jnp.where branch still propagates
    # NaN gradients, and d(sqrt)/dx is infinite at 0.
    safe_theta_sq = jnp.where(small_theta, 1.0, theta_sq)
    safe_theta = jnp.sqrt(safe_theta_sq)

    # X = (s - 1) / sigma  (-> 1 as sigma -> 0)
    X = jnp.where(small_sigma, 1.0 + sigma / 2.0, (s - 1.0) / safe_sigma)

    denom = safe_sigma * safe_sigma + safe_theta_sq

    # a = s * sin(theta), b = s * cos(theta)
    a = s * jnp.sin(safe_theta)
    b = s * jnp.cos(safe_theta)

    # General case (sigma != 0, theta != 0):
    # A_ = X? No: following Eade's "Lie groups for 2D and 3D transformations":
    #   C = X
    #   A = (a * sigma + (1 - b) * theta) / (theta * denom)
    #   B = (C - ((b - 1) * sigma + a * theta) / denom) / theta_sq
    A_gen = (a * safe_sigma + (1.0 - b) * safe_theta) / (safe_theta * denom)
    B_gen = (X - ((b - 1.0) * safe_sigma + a * safe_theta) / denom) / safe_theta_sq

    # sigma -> 0 limits: A -> (1 - cos)/theta^2, B -> (theta - sin)/theta^3.
    sA, sB, sC = _sinc_factors(theta_sq)
    A_sig0 = sB
    B_sig0 = sC

    # theta -> 0 limits (sigma != 0):
    # A -> ((sigma - 1) * s + 1) / sigma^2, B -> (s*(sigma^2/2 - sigma + 1) - 1)/sigma^3... use Taylor in theta:
    A_th0 = jnp.where(
        small_sigma, 0.5 + sigma / 6.0, ((safe_sigma - 1.0) * s + 1.0) / (safe_sigma * safe_sigma)
    )
    B_th0 = jnp.where(
        small_sigma,
        1.0 / 6.0,
        (s * (0.5 * safe_sigma * safe_sigma - safe_sigma + 1.0) - 1.0)
        / (safe_sigma * safe_sigma * safe_sigma),
    )

    A_ = jnp.where(small_theta, A_th0, jnp.where(small_sigma, A_sig0, A_gen))
    B_ = jnp.where(small_theta, B_th0, jnp.where(small_sigma, B_sig0, B_gen))
    C_ = X

    K = hat(w)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return C_[..., None, None] * eye + A_[..., None, None] * K + B_[..., None, None] * KK


def sim3_exp(xi: jnp.ndarray):
    """Tangent (..., 7) [omega, v, sigma] -> (s (...,), R (...,3,3), t (...,3))."""
    w, v, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(w)
    s = jnp.exp(sigma)
    W = _sim3_W(w, sigma)
    t = (W @ v[..., None])[..., 0]
    return s, R, t


def sim3_log(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(s, R, t) -> tangent (..., 7). Inverse of sim3_exp (W solved exactly)."""
    w = so3_log(R)
    sigma = jnp.log(jnp.maximum(s, 1e-12))
    W = _sim3_W(w, sigma)
    v = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([w, v, sigma[..., None]], axis=-1)


def sim3_compose(s1, R1, t1, s2, R2, t2):
    """S1 * S2: x -> s1 R1 (s2 R2 x + t2) + t1."""
    return s1 * s2, R1 @ R2, s1[..., None] * (R1 @ t2[..., None])[..., 0] + t1


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * (Rt @ t[..., None])[..., 0]


def sim3_apply(s, R, t, x):
    return s[..., None] * (R @ x[..., None])[..., 0] + t
