"""Batched linear triangulation.

Replaces the reference's per-point SVD triangulation
(Initializer::Triangulate, /root/reference/src/Initializer.cc:1017, and the
SVD in LocalMapping::CreateNewMapPoints,
/root/reference/src/LocalMapping.cc:322-331) with one batched TPU-friendly
solve: instead of an SVD of the 4x4 DLT matrix A per point, we take the
eigenvector of the 4x4 symmetric A^T A with smallest eigenvalue via a batched
eigh — identical nullspace, maps to dense batched linalg that XLA handles
well.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray):
    """DLT triangulation.

    Args:
      P1, P2: (..., 3, 4) projection matrices (K [R|t]) for the two views.
      uv1, uv2: (..., 2) pixel observations in each view.

    Returns:
      (x_world (..., 3), w (...,)) — the homogeneous scale w; points with
      |w| ~ 0 are at infinity and should be masked by the caller.
    """
    rows = [
        uv1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        uv1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        uv2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        uv2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    # Row-normalize for conditioning, then take the smallest eigenvector of A^T A.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = vecs[..., :, 0]  # (..., 4)
    w = X[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / safe_w[..., None], w


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
