"""Batched linear triangulation.

Replaces the reference's per-point SVD triangulation
(Initializer::Triangulate, /root/reference/src/Initializer.cc:1017, and the
SVD in LocalMapping::CreateNewMapPoints,
/root/reference/src/LocalMapping.cc:322-331) with one batched TPU-friendly
solve. The DLT rows r_i (X; 1) = 0 are solved in INHOMOGENEOUS form — the
3x3 normal equations (A^T A) X = -A^T a with a closed-form adjugate
inverse — instead of taking the 4x4 nullspace: batched small eigh costs
~70 ms for 20k systems on a v5e (iterative Jacobi sweeps), while the
closed-form solve is pure elementwise math (~2 ms). The two estimators
agree for finite points; near-infinity points (tiny normal-matrix
determinant) explode in norm and are rejected by the callers' cheirality /
reprojection / parallax gates, with the returned conditioning signal
playing the old homogeneous-w role.
"""

from __future__ import annotations

import jax.numpy as jnp


def _solve3_adjugate(m: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12):
    """Batched 3x3 solve via adjugate; returns (x, det)."""
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    det = m[..., 0, 0] * c00 + m[..., 0, 1] * c10 + m[..., 0, 2] * c20
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    safe = jnp.where(jnp.abs(det) < eps, eps, det)
    return jnp.einsum("...ij,...j->...i", adj, b) / safe[..., None], det


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray):
    """DLT triangulation.

    Args:
      P1, P2: (..., 3, 4) projection matrices (K [R|t]) for the two views.
      uv1, uv2: (..., 2) pixel observations in each view.

    Returns:
      (x_world (..., 3), w (...,)) — w is the conditioning signal (the
      normal-matrix determinant of the row-normalized system, in [0, ~1]);
      points with |w| ~ 0 are at/near infinity or degenerate and should be
      masked by the caller.
    """
    rows = [
        uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        uv2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        uv2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    A3 = A[..., :3]
    a4 = A[..., 3]
    AtA = jnp.einsum("...ij,...ik->...jk", A3, A3)
    Atb = -jnp.einsum("...ij,...i->...j", A3, a4)
    X, det = _solve3_adjugate(AtA, Atb)
    return X, det


def triangulate_two_view(
    R1: jnp.ndarray,
    t1: jnp.ndarray,
    R2: jnp.ndarray,
    t2: jnp.ndarray,
    K: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
):
    """Triangulate with explicit world->camera poses and shared intrinsics K.

    R*, t*: (..., 3, 3) / (..., 3) world->camera. uv*: (..., 2) undistorted
    pixels. Returns (x_world, w) as in triangulate_dlt.
    """
    P1 = K @ jnp.concatenate([R1, t1[..., None]], axis=-1)
    P2 = K @ jnp.concatenate([R2, t2[..., None]], axis=-1)
    return triangulate_dlt(P1, P2, uv1, uv2)
