"""Unrolled SPD solve vs jnp.linalg.solve."""

import jax.numpy as jnp
import numpy as np

from tpuslam.optim.linalg import solve_spd


def test_solve_spd_matches_lu(rng):
    for n in (3, 6, 7):
        A = rng.normal(size=(n, n)).astype(np.float32)
        H = A @ A.T + n * np.eye(n, dtype=np.float32)
        b = rng.normal(size=(n,)).astype(np.float32)
        x = np.asarray(solve_spd(jnp.asarray(H), jnp.asarray(b)))
        ref = np.linalg.solve(H, b)
        np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-5)


def test_solve_spd_batched(rng):
    H = rng.normal(size=(5, 6, 6)).astype(np.float32)
    H = np.einsum("bij,bkj->bik", H, H) + 6 * np.eye(6, dtype=np.float32)
    b = rng.normal(size=(5, 6)).astype(np.float32)
    x = np.asarray(solve_spd(jnp.asarray(H), jnp.asarray(b)))
    ref = np.stack([np.linalg.solve(H[i], b[i]) for i in range(5)])
    np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-5)
