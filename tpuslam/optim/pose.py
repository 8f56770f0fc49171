"""Pose-only optimization: one SE3 vertex, batched unary reprojection edges.

TPU-native equivalent of Optimizer::PoseOptimization
(/root/reference/src/Optimizer.cc:239-451): the reference builds a g2o graph
with unary mono/stereo edges and runs 4 rounds of 10 LM iterations,
re-classifying inliers by chi2 (5.991 / 7.815) between rounds and dropping
the Huber kernel from round 3 on. Here the whole schedule is one jitted
function: residuals/Jacobians are batched over the fixed-capacity edge
arrays, the 6x6 normal system is assembled with masked reductions, and the
rounds/iterations are static loops.

Every function accepts arbitrary LEADING BATCH DIMS (R (..., 3, 3),
pts (..., N, 3)): multi-stream tracking optimizes B independent poses in one
program with natively-batched math — measured ~2x faster than jax.vmap of
the single-stream version (vmap's batched 6x6 LU and einsum lowerings are
poor on TPU; natively the solve uses the unrolled batched Cholesky).

Jacobians follow g2o's analytic forms
(/root/reference/Thirdparty/g2o/g2o/types/types_six_dof_expmap.cpp:103-139):
left-multiplied twist perturbation xi = [omega, v] on T_cw.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.geometry.se3 import hat, se3_exp, se3_compose, so3_project
from tpuslam.optim.linalg import solve_spd
from tpuslam.optim.robust import CHI2_MONO, CHI2_STEREO


class PoseObs(NamedTuple):
    """Fixed-capacity observation set for pose-only optimization.

    obs rows are (u, v, u_right); u_right < 0 marks a mono observation
    (same convention as the reference's mvuRight)."""

    pts_w: jnp.ndarray      # (..., N, 3) world points
    uvr: jnp.ndarray        # (..., N, 3) observed (u, v, u_right)
    inv_sigma2: jnp.ndarray # (..., N,) information scale per keypoint octave
    valid: jnp.ndarray      # (..., N,) bool


# Plain numpy, NOT jnp: a module-level jnp.array would initialize jax
# backends at import time, which pins the platform before callers (worker
# subprocesses, conftest) can select one.
_MONO_ROWS = np.array([1.0, 1.0, 0.0], np.float32)


def _residual_jacobian(cam: PinholeCamera, R, t, obs: PoseObs):
    """Residuals (..., N, 3) and Jacobians (..., N, 3, 6) for all edges.

    Row 3 (u_right) is zeroed for mono edges. Residual = observed -
    projected, matching g2o's computeError sign; J is d(residual)/d(xi).
    """
    p = jnp.einsum("...ij,...nj->...ni", R, obs.pts_w) + t[..., None, :]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z

    stereo = obs.uvr[..., 2] >= 0.0
    r = jnp.stack(
        [
            obs.uvr[..., 0] - u,
            obs.uvr[..., 1] - v,
            jnp.where(stereo, obs.uvr[..., 2] - ur, 0.0),
        ],
        axis=-1,
    )

    # d(u,v,ur)/dp:
    zeros = jnp.zeros_like(x)
    du_dp = jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1)
    dv_dp = jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    dur_dp = du_dp + jnp.stack([zeros, zeros, cam.bf * inv_z2], axis=-1)
    dproj_dp = jnp.stack([du_dp, dv_dp, dur_dp], axis=-2)  # (..., N, 3, 3)

    # dp/dxi for left perturbation exp(xi) T: dp/domega = -[p]x, dp/dv = I.
    dp_dxi = jnp.concatenate(
        [-hat(p), jnp.broadcast_to(jnp.eye(3), p.shape[:-1] + (3, 3))], axis=-1
    )  # (..., N, 3, 6)

    # Residual = obs - proj => J = -dproj/dp @ dp/dxi; mono edges drop the
    # u_right row.
    J = -(dproj_dp @ dp_dxi)  # (..., N, 3, 6)
    J = J * jnp.where(stereo[..., None], 1.0, _MONO_ROWS)[..., None]
    return r, J, stereo


def pose_optimization(
    cam: PinholeCamera,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    obs: PoseObs,
    rounds: int = 4,
    iters_per_round: int = 10,
):
    """Optimize T_cw from 3D-2D(3) correspondences; leading batch dims OK.

    Returns (R, t, inlier_mask, n_inliers). Mirrors the reference schedule:
    `rounds` x `iters_per_round` LM with chi2 reclassification between
    rounds; Huber on for the first two rounds only (Optimizer.cc:367-442).
    """
    batch_shape = R0.shape[:-2]
    stereo_mask = obs.uvr[..., 2] >= 0.0
    chi2_th = jnp.where(stereo_mask, CHI2_STEREO, CHI2_MONO)
    # Per-edge information: isotropic inv_sigma2 on each residual dim.
    info = obs.inv_sigma2

    def edge_chi2(R, t):
        """Residual-only chi2 (no Jacobians — keeps the trial-point eval
        cheap; the structure mirrors _residual_jacobian's projection)."""
        p = jnp.einsum("...ij,...nj->...ni", R, obs.pts_w) + t[..., None, :]
        z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
        u = cam.fx * p[..., 0] / z + cam.cx
        v = cam.fy * p[..., 1] / z + cam.cy
        ur = u - cam.bf / z
        du = obs.uvr[..., 0] - u
        dv = obs.uvr[..., 1] - v
        dur = jnp.where(stereo_mask, obs.uvr[..., 2] - ur, 0.0)
        return (du * du + dv * dv + dur * dur) * info

    delta_sq = jnp.where(stereo_mask, CHI2_STEREO, CHI2_MONO)

    def lm_round(R, t, active, use_huber):
        def rho_sum(chi2):
            rho = jnp.where(
                use_huber & (chi2 > delta_sq),
                2.0 * jnp.sqrt(delta_sq * jnp.maximum(chi2, 1e-12)) - delta_sq,
                chi2,
            )
            return jnp.sum(rho * active, axis=-1)

        def body(_, carry):
            R, t, lam = carry
            r, J, stereo = _residual_jacobian(cam, R, t, obs)
            chi2 = jnp.sum(r * r, axis=-1) * info
            if use_huber:
                w = jnp.minimum(1.0, jnp.sqrt(delta_sq / jnp.maximum(chi2, 1e-12)))
            else:
                w = jnp.ones_like(chi2)
            w = w * info * active
            H = jnp.einsum("...nij,...n,...nik->...jk", J, w, J)
            # Gradient of 1/2 r^T W r is J^T W r; the GN/LM step is its
            # negation: dx = -(H + lam I)^-1 J^T W r.
            b = -jnp.einsum("...nij,...n,...ni->...j", J, w, r)
            H_lm = H + lam[..., None, None] * jnp.eye(6)
            # NOTE: measured on v5e — XLA's LU solve (4.5 us fixed cost)
            # beats an unrolled scalar Cholesky single-stream (the 150-op
            # scalar chain is slower than the kernel), but the Cholesky
            # vectorizes across streams and wins batched.
            if batch_shape:
                dx = solve_spd(H_lm, b)
            else:
                dx = jnp.linalg.solve(H_lm, b)
            R_new, t_new = se3_compose(*se3_exp(dx), R, t)
            # Accept if robust total error decreases (e_old reuses the chi2
            # already computed at the current point).
            e_old = rho_sum(chi2)
            e_new = rho_sum(edge_chi2(R_new, t_new))
            ok = e_new < e_old
            R = jnp.where(ok[..., None, None], R_new, R)
            t = jnp.where(ok[..., None], t_new, t)
            lam = jnp.where(ok, lam * 0.5, lam * 4.0)
            return R, t, lam

        lam0 = jnp.full(batch_shape, 1e-3, jnp.float32)
        R, t, _ = jax.lax.fori_loop(0, iters_per_round, body, (R, t, lam0))
        return R, t

    R, t = R0, t0
    active = obs.valid.astype(jnp.float32)
    inliers = obs.valid
    for rnd in range(rounds):
        use_huber = rnd < 2  # kernel removed from round 3 (Optimizer.cc:435)
        R, t = lm_round(R, t, active, use_huber)
        chi2 = edge_chi2(R, t)
        inliers = obs.valid & (chi2 <= chi2_th)
        active = inliers.astype(jnp.float32)
    # Re-orthonormalize before the pose re-enters the tracking chain: the
    # velocity model inverts-by-transpose, which amplifies (not preserves)
    # any orthonormality drift accumulated by the float32 updates here.
    R = so3_project(R)
    return R, t, inliers, jnp.sum(inliers.astype(jnp.int32), axis=-1)
