"""Tiny dense linear algebra that fuses on TPU.

jnp.linalg.solve on a 6x6 lowers to XLA's general LU routine, which costs
~4.5 us of fixed overhead per call on TPU — 0.2 ms of the 4x10 LM schedule
in pose_optimization. For the tiny SPD systems SLAM solves every iteration
(6x6 pose Hessian, 7x7 Sim3, 4x4 EPnP beta systems) an unrolled Cholesky is
a pure scalar chain that XLA fuses into the surrounding program for ~zero
marginal cost.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_spd(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b for a small static-size SPD H ((..., n, n), n <= ~12)
    via fully-unrolled Cholesky. Batched over leading dims.

    Mirrors what g2o's dense linear solver does for the pose problem
    (/root/reference/Thirdparty/g2o/g2o/solvers/linear_solver_dense.h) —
    Cholesky on the (damped) normal matrix.
    """
    n = H.shape[-1]
    eps = jnp.asarray(1e-12, H.dtype)
    # Cholesky: L lower-triangular with H = L L^T, unrolled column by column.
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # Forward substitution: L y = b.
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Back substitution: L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
