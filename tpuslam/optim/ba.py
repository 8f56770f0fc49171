"""Bundle adjustment: batched LM with matrix-free Schur-complement PCG.

TPU-native replacement for the reference's g2o BA
(Optimizer::BundleAdjustment /root/reference/src/Optimizer.cc:49,
Optimizer::LocalBundleAdjustment :453) and its BlockSolver Schur
marginalization (/root/reference/Thirdparty/g2o/g2o/core/block_solver.hpp).
g2o eliminates the point blocks and solves the reduced camera system with
sparse Cholesky; a CSparse-style factorization does not map to TPU compute
units, so we solve the same reduced system with preconditioned conjugate
gradients instead, applying S = Hpp - Hpl Hll^-1 Hlp matrix-free:

    S v = Hpp_blocks v - scatter_kf( W_e @ Hll^-1_{pt_e} @ gather_pt(W_e^T v) )

— every term is a batched small matmul or a segment reduction, which XLA
maps to the MXU/VPU. The block-Jacobi preconditioner uses the 6x6 pose
blocks. This is the ITERATIVE_SCHUR strategy of Ceres, chosen here because
it is the TPU-native formulation, with identical stationary points to the
reference's exact solve.

Problems are fixed-capacity SoA arrays; fixed/invalid poses and points are
handled by masking their Jacobians and pinning their blocks to identity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.geometry.se3 import hat, se3_exp, se3_compose, so3_project
from tpuslam.optim.robust import CHI2_MONO, CHI2_STEREO


class BAProblem(NamedTuple):
    """Fixed-capacity bundle adjustment problem.

    Edge e observes point pt[e] from keyframe kf[e] at pixel uvr[e]
    (u, v, u_right; u_right < 0 => mono edge). fixed_* entries contribute
    residuals but are not updated (gauge / boundary keyframes, like the
    fixed KF set of Optimizer.cc:455-504).
    """

    R: jnp.ndarray          # (K, 3, 3) world->camera rotations
    t: jnp.ndarray          # (K, 3)
    X: jnp.ndarray          # (P, 3) world points
    kf: jnp.ndarray         # (E,) int32
    pt: jnp.ndarray         # (E,) int32
    uvr: jnp.ndarray        # (E, 3)
    inv_sigma2: jnp.ndarray # (E,)
    valid: jnp.ndarray      # (E,) bool
    fixed_kf: jnp.ndarray   # (K,) bool
    fixed_pt: jnp.ndarray   # (P,) bool


def _edge_terms(cam: PinholeCamera, R, t, X, prob: BAProblem):
    """Residual (E, 3), J_pose (E, 3, 6), J_pt (E, 3, 3), stereo mask."""
    Rk = R[prob.kf]
    tk = t[prob.kf]
    Xe = X[prob.pt]
    p = (Rk @ Xe[..., None])[..., 0] + tk
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    stereo = prob.uvr[:, 2] >= 0.0

    r = jnp.stack(
        [
            prob.uvr[:, 0] - u,
            prob.uvr[:, 1] - v,
            jnp.where(stereo, prob.uvr[:, 2] - ur, 0.0),
        ],
        axis=-1,
    )

    zeros = jnp.zeros_like(x)
    du_dp = jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1)
    dv_dp = jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    dur_dp = du_dp + jnp.stack([zeros, zeros, cam.bf * inv_z2], axis=-1)
    dproj_dp = jnp.stack([du_dp, dv_dp, dur_dp], axis=-2)  # (E, 3, 3)
    dproj_dp = jnp.where(stereo[:, None, None], dproj_dp, dproj_dp.at[:, 2, :].set(0.0))

    dp_dxi = jnp.concatenate(
        [-hat(p), jnp.broadcast_to(jnp.eye(3), p.shape[:-1] + (3, 3))], axis=-1
    )
    J_pose = -(dproj_dp @ dp_dxi)          # (E, 3, 6)
    J_pt = -(dproj_dp @ Rk)                # (E, 3, 3): dp/dX = R
    return r, J_pose, J_pt, stereo


def _batched_inv3(A: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Batched 3x3 inverse via adjugate (faster than linalg.inv on TPU)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def bundle_adjustment(
    cam: PinholeCamera,
    prob: BAProblem,
    iters: int = 10,
    use_huber: bool = True,
    cg_iters: int = 40,
    lam0: float = 1e-4,
    axis_name: str | None = None,
):
    """Run `iters` LM steps. Returns (R, t, X, edge_chi2).

    The caller implements the reference's two-phase schedule (5 iterations,
    prune chi2 outliers, 10 more — Optimizer.cc:659-757) by calling this
    twice with a tightened `valid` mask; chi2 per edge is returned for that.

    axis_name: when set, the solver runs as the per-shard body of a
    `shard_map` over that mesh axis — edge and point arrays are this shard's
    block, pose state is replicated, and every pose-indexed reduction (the
    normal-equation assembly, the Schur coupling, the robust objective) is
    psum'd across the axis. All shards then walk identical replicated pose
    iterates while point work stays local (SURVEY.md §2.4 P7).
    """
    K = prob.R.shape[0]
    P = prob.X.shape[0]
    E = prob.kf.shape[0]
    stereo_mask = prob.uvr[:, 2] >= 0.0
    delta_sq = jnp.where(stereo_mask, CHI2_STEREO, CHI2_MONO)
    info = prob.inv_sigma2
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)

    def allreduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def edge_chi2(R, t, X):
        r, _, _, _ = _edge_terms(cam, R, t, X, prob)
        return jnp.sum(r * r, axis=-1) * info

    def robust_total(R, t, X, active):
        c = edge_chi2(R, t, X)
        if use_huber:
            rho = jnp.where(
                c > delta_sq,
                2.0 * jnp.sqrt(delta_sq * jnp.maximum(c, 1e-12)) - delta_sq,
                c,
            )
        else:
            rho = c
        return allreduce(jnp.sum(rho * active))

    active0 = prob.valid.astype(jnp.float32)

    def step(carry, _):
        R, t, X, lam = carry
        r, Jp, Jl, _ = _edge_terms(cam, R, t, X, prob)
        chi2 = jnp.sum(r * r, axis=-1) * info
        if use_huber:
            w = jnp.minimum(1.0, jnp.sqrt(delta_sq / jnp.maximum(chi2, 1e-12)))
        else:
            w = jnp.ones_like(chi2)
        w = w * info * active0
        # Mask fixed blocks by zeroing their Jacobians.
        Jp = jnp.where(prob.fixed_kf[prob.kf][:, None, None], 0.0, Jp)
        Jl = jnp.where(prob.fixed_pt[prob.pt][:, None, None], 0.0, Jl)

        wJp = w[:, None, None] * Jp
        # Per-edge blocks.
        Hpp_e = jnp.einsum("eij,eik->ejk", wJp, Jp)       # (E, 6, 6)
        Hll_e = jnp.einsum("eij,eik->ejk", w[:, None, None] * Jl, Jl)  # (E,3,3)
        W_e = jnp.einsum("eij,eik->ejk", wJp, Jl)          # (E, 6, 3) = Hpl block
        # Negated gradients: the GN/LM step solves H dx = -J^T W r.
        bp_e = -jnp.einsum("eij,ei->ej", wJp, r)           # (E, 6)
        bl_e = -jnp.einsum("eij,ei->ej", w[:, None, None] * Jl, r)

        # Point-side (Hll, bl) assembly is shard-local in the point-sharded
        # decomposition — no collective.
        Hll = jnp.zeros((P, 3, 3)).at[prob.pt].add(Hll_e)
        bl = jnp.zeros((P, 3)).at[prob.pt].add(bl_e)

        # LM damping (additive, like g2o's Levenberg lambda on the diagonal)
        # plus a trace-relative floor: points with a single mono observation
        # have rank-2 Hll blocks whose float32 inverses are catastrophically
        # sensitive to summation order (visible as divergence between sharded
        # and single-device runs). The floor caps the block condition number
        # at ~1e5, damping motion along the unobservable direction. Fixed /
        # empty blocks are pinned to identity so every inverse exists.
        tr3 = (Hll[..., 0, 0] + Hll[..., 1, 1] + Hll[..., 2, 2])[..., None, None]
        Hll = Hll + (lam + 1e-5 * tr3 + 1e-10) * eye3[None]
        kf_pinned = prob.fixed_kf
        pt_pinned = prob.fixed_pt
        Hll = jnp.where(pt_pinned[:, None, None], eye3[None], Hll)
        bl = jnp.where(pt_pinned[:, None], 0.0, bl)
        W_e = jnp.where(kf_pinned[prob.kf][:, None, None], 0.0, W_e)
        W_e = jnp.where(pt_pinned[prob.pt][:, None, None], 0.0, W_e)

        Hll_inv = _batched_inv3(Hll)

        # Schur-RHS coupling term W Hll^-1 bl, computable shard-locally
        # before any reduction — so Hpp, bp, and the coupling ride ONE
        # packed (K, 6, 8) psum instead of three collectives per iteration
        # (ICI latency, not bandwidth, bounds these K-sized payloads).
        z0 = jnp.einsum("pij,pj->pi", Hll_inv, bl)
        coup_e = jnp.einsum("eij,ej->ei", W_e, z0[prob.pt])
        packed = jnp.zeros((K, 6, 8))
        packed = packed.at[prob.kf, :, :6].add(Hpp_e)
        packed = packed.at[prob.kf, :, 6].add(bp_e)
        packed = packed.at[prob.kf, :, 7].add(coup_e)
        packed = allreduce(packed)
        Hpp, bp, coup = packed[:, :, :6], packed[:, :, 6], packed[:, :, 7]

        tr6 = jnp.trace(Hpp, axis1=-2, axis2=-1)[..., None, None]
        Hpp = Hpp + (lam + 1e-5 * tr6 + 1e-10) * eye6[None]
        Hpp = jnp.where(kf_pinned[:, None, None], eye6[None], Hpp)
        bp = jnp.where(kf_pinned[:, None], 0.0, bp)

        def S_matvec(vk):
            """vk: (K, 6) -> S @ vk."""
            y = jnp.einsum("eij,ej->ei", jnp.swapaxes(W_e, -1, -2), vk[prob.kf])
            ysum = jnp.zeros((P, 3)).at[prob.pt].add(y)
            z = jnp.einsum("pij,pj->pi", Hll_inv, ysum)
            u = jnp.einsum("eij,ej->ei", W_e, z[prob.pt])
            coupling = allreduce(jnp.zeros((K, 6)).at[prob.kf].add(u))
            return jnp.einsum("kij,kj->ki", Hpp, vk) - coupling

        # Schur RHS (coupling already reduced in the packed psum above).
        rhs = bp - jnp.where(kf_pinned[:, None], 0.0, coup)

        # Block-Jacobi PCG on S dx = rhs.
        Minv = jnp.linalg.inv(Hpp)

        def precond(v):
            return jnp.einsum("kij,kj->ki", Minv, v)

        def cg_body(_, cg):
            xk, rk, pk, rz = cg
            Sp = S_matvec(pk)
            denom = jnp.sum(pk * Sp)
            alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
            xk = xk + alpha * pk
            rk = rk - alpha * Sp
            zk = precond(rk)
            rz_new = jnp.sum(rk * zk)
            beta = jnp.where(jnp.abs(rz) > 1e-12, rz_new / rz, 0.0)
            pk = zk + beta * pk
            return xk, rk, pk, rz_new

        x0 = jnp.zeros((K, 6))
        r0 = rhs
        z0c = precond(r0)
        cg0 = (x0, r0, z0c, jnp.sum(r0 * z0c))
        dx_pose, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, cg0)

        # Back-substitute points: dx_pt = Hll^-1 (bl - Hlp dx_pose).
        y = jnp.einsum("eij,ej->ei", jnp.swapaxes(W_e, -1, -2), dx_pose[prob.kf])
        hlp_dx = jnp.zeros((P, 3)).at[prob.pt].add(y)
        dx_pt = jnp.einsum("pij,pj->pi", Hll_inv, bl - hlp_dx)

        dx_pose = jnp.where(kf_pinned[:, None], 0.0, dx_pose)
        dx_pt = jnp.where(pt_pinned[:, None], 0.0, dx_pt)

        dR, dt = se3_exp(dx_pose)
        R_new, t_new = se3_compose(dR, dt, R, t)
        X_new = X + dx_pt

        e_old = robust_total(R, t, X, active0)
        e_new = robust_total(R_new, t_new, X_new, active0)
        ok = e_new < e_old
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        X = jnp.where(ok, X_new, X)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        return (R, t, X, lam), None

    (R, t, X, _), _ = jax.lax.scan(
        step, (prob.R, prob.t, prob.X, jnp.float32(lam0)), None, length=iters
    )
    # Write back exact rotations: map poses feed every later composition
    # (tracking, export, pose graph); see so3_project on why drift amplifies.
    R = so3_project(R)
    return R, t, X, edge_chi2(R, t, X)


def dense_schur_bundle_adjustment(
    cam: PinholeCamera,
    prob: BAProblem,
    active: jnp.ndarray,
    iters: int = 10,
    use_huber: bool = True,
    lam0: float = 1e-4,
):
    """LM bundle adjustment with an EXPLICIT dense reduced camera system.

    The CG solver above applies S = Hpp - W Hll^-1 W^T matrix-free: per CG
    iteration it scatters edge contributions into the (P,·) point arrays.
    TPU scatters with duplicate indices cost ~0.75 ms per 16k rows (they
    serialize), so 4 LM x 40 CG iterations spend >500 ms in scatters alone
    — the measured local-BA wall time of round 4. Local BA only adjusts
    the covisibility window (<= A keyframes, Optimizer.cc:455-504), so the
    reduced camera system is small enough to ASSEMBLE DENSELY and solve by
    factorization, exactly like g2o's BlockSolver eliminates points and
    Cholesky-solves the reduced system (block_solver.hpp) — but with the
    assembly mapped to the MXU:

      * pose-side reductions (Hpp, bp, Schur RHS coupling) become one-hot
        (E, A) matmuls — 25x faster than TPU scatter at these sizes;
      * the coupling matrix W Hll^-1 W^T is Sum_p B_p^T B_p with
        B[p, a] = L_p^T W_{a,p}^T (L_p L_p^T = Hll_p^-1), built with ONE
        edge scatter into (P, A, 3, 6) and contracted on the MXU;
      * the (A*6, A*6) system is solved directly — exact, no CG tail.

    Per LM iteration: 3 scatters total (point-side Hll/bl pack, B build,
    back-substitution) instead of 2 per CG iteration.

    `active`: (A,) int32 keyframe slots that are adjustable, padded with
    -1. Every keyframe NOT listed is held fixed (boundary), in addition to
    prob.fixed_kf. A is static; callers rank-compact the active window.

    Returns (R, t, X, edge_chi2) like `bundle_adjustment`.
    """
    K = prob.R.shape[0]
    P = prob.X.shape[0]
    E = prob.kf.shape[0]
    A = active.shape[0]
    stereo_mask = prob.uvr[:, 2] >= 0.0
    delta_sq = jnp.where(stereo_mask, CHI2_STEREO, CHI2_MONO)
    info = prob.inv_sigma2
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)

    # Static edge->active-slot map: slot_of_kf[k] in [0, A) for active
    # keyframes, A (parking) otherwise; fixed_kf entries never map.
    act_ok = active >= 0
    slot_of_kf = jnp.full((K + 1,), A, jnp.int32).at[
        jnp.where(act_ok, active, K)
    ].set(jnp.where(act_ok, jnp.arange(A, dtype=jnp.int32), A))[:K]
    slot_of_kf = jnp.where(prob.fixed_kf, A, slot_of_kf)
    a_e = slot_of_kf[prob.kf]                      # (E,) in [0, A]
    e_active = a_e < A
    # One-hot over active slots only (fixed edges row = 0).
    G = jax.nn.one_hot(a_e, A, dtype=jnp.float32)  # (E, A)

    def edge_chi2(R, t, X):
        r, _, _, _ = _edge_terms(cam, R, t, X, prob)
        return jnp.sum(r * r, axis=-1) * info

    def robust_total(R, t, X, act):
        c = edge_chi2(R, t, X)
        if use_huber:
            rho = jnp.where(
                c > delta_sq,
                2.0 * jnp.sqrt(delta_sq * jnp.maximum(c, 1e-12)) - delta_sq,
                c,
            )
        else:
            rho = c
        return jnp.sum(rho * act)

    active0 = prob.valid.astype(jnp.float32)
    pt_pinned = prob.fixed_pt

    def step(carry, _):
        R, t, X, lam = carry
        r, Jp, Jl, _ = _edge_terms(cam, R, t, X, prob)
        chi2 = jnp.sum(r * r, axis=-1) * info
        if use_huber:
            w = jnp.minimum(1.0, jnp.sqrt(delta_sq / jnp.maximum(chi2, 1e-12)))
        else:
            w = jnp.ones_like(chi2)
        w = w * info * active0
        Jp = jnp.where(e_active[:, None, None], Jp, 0.0)
        Jl = jnp.where(pt_pinned[prob.pt][:, None, None], 0.0, Jl)

        wJp = w[:, None, None] * Jp
        Hpp_e = jnp.einsum("eij,eik->ejk", wJp, Jp)              # (E, 6, 6)
        Hll_e = jnp.einsum("eij,eik->ejk", w[:, None, None] * Jl, Jl)
        W_e = jnp.einsum("eij,eik->ejk", wJp, Jl)                # (E, 6, 3)
        bp_e = -jnp.einsum("eij,ei->ej", wJp, r)                 # (E, 6)
        bl_e = -jnp.einsum("eij,ei->ej", w[:, None, None] * Jl, r)

        # Point-side assembly: ONE packed scatter (Hll 9 + bl 3 floats).
        pack_l = jnp.concatenate(
            [Hll_e.reshape(E, 9), bl_e], axis=-1
        )                                                         # (E, 12)
        acc_l = jnp.zeros((P, 12)).at[prob.pt].add(pack_l)
        Hll = acc_l[:, :9].reshape(P, 3, 3)
        bl = acc_l[:, 9:]

        tr3 = (Hll[..., 0, 0] + Hll[..., 1, 1] + Hll[..., 2, 2])[..., None, None]
        Hll = Hll + (lam + 1e-5 * tr3 + 1e-10) * eye3[None]
        Hll = jnp.where(pt_pinned[:, None, None], eye3[None], Hll)
        bl = jnp.where(pt_pinned[:, None], 0.0, bl)
        Hll_inv = _batched_inv3(Hll)
        # Cholesky factor of Hll^-1 (3x3 closed form) for the B = L^T W^T
        # coupling factorization. Hll is SPD after damping, so Hll_inv is.
        L = _chol3(Hll_inv)

        # Pose-side assembly as one-hot matmuls (no scatter).
        pose_pack = jnp.concatenate(
            [Hpp_e.reshape(E, 36), bp_e], axis=-1
        )                                                         # (E, 42)
        acc_p = jnp.einsum("ea,ex->ax", G, pose_pack)             # (A, 42)
        Hpp = acc_p[:, :36].reshape(A, 6, 6)
        bp = acc_p[:, 36:]

        tr6 = jnp.trace(Hpp, axis1=-2, axis2=-1)[..., None, None]
        Hpp = Hpp + (lam + 1e-5 * tr6 + 1e-10) * eye6[None]
        # Padded active slots (-1) get identity blocks / zero rhs.
        Hpp = jnp.where(act_ok[:, None, None], Hpp, eye6[None])
        bp = jnp.where(act_ok[:, None], bp, 0.0)

        # Schur RHS coupling W Hll^-1 bl per active slot (no scatter).
        z0 = jnp.einsum("pij,pj->pi", Hll_inv, bl)
        coup_e = jnp.einsum("eij,ej->ei", W_e, z0[prob.pt])       # (E, 6)
        coup = jnp.einsum("ea,ei->ai", G, coup_e)
        rhs = bp - jnp.where(act_ok[:, None], coup, 0.0)

        # Coupling matrix: B[p, a] = L_p^T W_{a,p}^T (3, 6); one edge
        # scatter builds B, the MXU contracts Sum_p B_p^T B_p.
        B_e = jnp.einsum("eji,ekj->eik", L[prob.pt], W_e)         # (E, 3, 6)
        B = jnp.zeros((P, A + 1, 18)).at[prob.pt, a_e].add(
            B_e.reshape(E, 18)
        )[:, :A].reshape(P, A, 3, 6)
        Sc = jnp.einsum("paij,pbik->ajbk", B, B).reshape(A * 6, A * 6)
        S = _blockdiag6(Hpp) - Sc

        dx_a = jnp.linalg.solve(S, rhs.reshape(A * 6)).reshape(A, 6)
        dx_a = jnp.where(act_ok[:, None], dx_a, 0.0)

        # Scatter active deltas back to full K (A rows — cheap).
        dx_pose = jnp.zeros((K, 6)).at[
            jnp.where(act_ok, active, K - 1)
        ].add(jnp.where(act_ok[:, None], dx_a, 0.0))

        # Back-substitute points: dx_pt = Hll^-1 (bl - W^T dx_pose).
        y = jnp.einsum("eij,ej->ei", jnp.swapaxes(W_e, -1, -2), dx_pose[prob.kf])
        hlp_dx = jnp.zeros((P, 3)).at[prob.pt].add(y)
        dx_pt = jnp.einsum("pij,pj->pi", Hll_inv, bl - hlp_dx)
        dx_pt = jnp.where(pt_pinned[:, None], 0.0, dx_pt)

        dR, dt = se3_exp(dx_pose)
        R_new, t_new = se3_compose(dR, dt, R, t)
        X_new = X + dx_pt

        e_old = robust_total(R, t, X, active0)
        e_new = robust_total(R_new, t_new, X_new, active0)
        ok = e_new < e_old
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        X = jnp.where(ok, X_new, X)
        lam = jnp.where(ok, lam * 0.5, lam * 4.0)
        return (R, t, X, lam), None

    (R, t, X, _), _ = jax.lax.scan(
        step, (prob.R, prob.t, prob.X, jnp.float32(lam0)), None, length=iters
    )
    R = so3_project(R)
    return R, t, X, edge_chi2(R, t, X)


def _chol3(A: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Batched closed-form 3x3 Cholesky (lower). Inputs must be SPD up to
    damping; diagonal pivots are floored for stray non-PD blocks."""
    a00 = jnp.maximum(A[..., 0, 0], eps)
    l00 = jnp.sqrt(a00)
    l10 = A[..., 1, 0] / l00
    l20 = A[..., 2, 0] / l00
    d11 = jnp.maximum(A[..., 1, 1] - l10 * l10, eps)
    l11 = jnp.sqrt(d11)
    l21 = (A[..., 2, 1] - l20 * l10) / l11
    d22 = jnp.maximum(A[..., 2, 2] - l20 * l20 - l21 * l21, eps)
    l22 = jnp.sqrt(d22)
    z = jnp.zeros_like(l00)
    return jnp.stack(
        [
            jnp.stack([l00, z, z], axis=-1),
            jnp.stack([l10, l11, z], axis=-1),
            jnp.stack([l20, l21, l22], axis=-1),
        ],
        axis=-2,
    )


def _blockdiag6(Hpp: jnp.ndarray) -> jnp.ndarray:
    """(A, 6, 6) block-diagonal -> (A*6, A*6) dense."""
    A = Hpp.shape[0]
    out = jnp.zeros((A, 6, A, 6))
    out = out.at[jnp.arange(A), :, jnp.arange(A), :].set(Hpp)
    return out.reshape(A * 6, A * 6)
