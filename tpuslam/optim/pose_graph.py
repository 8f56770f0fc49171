"""Sim3 pose-graph (essential graph) optimization.

TPU-native version of Optimizer::OptimizeEssentialGraph
(/root/reference/src/Optimizer.cc:781-1043): 7-DoF Sim3 vertices (6 when
scale is fixed for stereo/RGB-D) over loop edges + spanning tree + strong
covisibility edges, Gauss-Newton with the relative-pose residual
e_ij = log_sim3(S_ij_meas * S_i * S_j^-1). The reference builds a sparse
g2o graph and solves with Eigen Cholesky; here edge Jacobians come from
vmapped forward-mode autodiff of the exact residual. The normal system is
solved dense ((7K)^2) for small K, and matrix-free for large K: H·x is
computed directly from the edge Jacobians (gather x at edge endpoints,
apply J^T(J·x), scatter-add) inside a block-Jacobi-preconditioned CG —
O(E·49) per matvec, never materializing (7K)^2, so the pose graph scales
to KITTI-00 keyframe counts (1.4k KFs) and beyond.

After convergence, map points are corrected through their reference
keyframe's old->new Sim3 (Optimizer.cc:989-1043), done by the caller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.geometry.sim3 import (
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
)


class Sim3Edges(NamedTuple):
    """Fixed-capacity relative-pose constraints i -> j.

    meas_* hold S_ji = S_j * S_i^-1 at measurement time; weight scales the
    edge (1 for spanning/covis, possibly higher for loop edges)."""

    i: jnp.ndarray        # (E,) int32
    j: jnp.ndarray        # (E,) int32
    meas_s: jnp.ndarray   # (E,)
    meas_R: jnp.ndarray   # (E, 3, 3)
    meas_t: jnp.ndarray   # (E, 3)
    valid: jnp.ndarray    # (E,)
    weight: jnp.ndarray   # (E,)


def make_relative(s_i, R_i, t_i, s_j, R_j, t_j):
    """S_ji = S_j * S_i^-1 for batched node poses."""
    si, Ri, ti = sim3_inverse(s_i, R_i, t_i)
    return sim3_compose(s_j, R_j, t_j, si, Ri, ti)


def _edge_residual(xi_i, xi_j, s_i, R_i, t_i, s_j, R_j, t_j, ms, mR, mt):
    """Residual for one edge with local tangent perturbations xi on each node:
    e = log(S_ji_meas * (exp(xi_i) S_i) * (exp(xi_j) S_j)^-1)."""
    ds, dR, dt = sim3_exp(xi_i)
    s1, R1, t1 = sim3_compose(ds, dR, dt, s_i, R_i, t_i)
    ds2, dR2, dt2 = sim3_exp(xi_j)
    s2, R2, t2 = sim3_compose(ds2, dR2, dt2, s_j, R_j, t_j)
    s2i, R2i, t2i = sim3_inverse(s2, R2, t2)
    se, Re, te = sim3_compose(*sim3_compose(ms, mR, mt, s1, R1, t1), s2i, R2i, t2i)
    return sim3_log(se, Re, te)


def optimize_pose_graph(
    s: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    node_valid: jnp.ndarray,
    node_fixed: jnp.ndarray,
    edges: Sim3Edges,
    iters: int = 20,
    fix_scale: bool = False,
    lam: float = 1e-6,
    dense_max_nodes: int = 192,
    cg_iters: int = 150,
):
    """Optimize node Sim3 poses S_iw. Returns (s, R, t).

    node_fixed pins poses (the loop KF, Optimizer.cc:840). With
    fix_scale=True the scale tangent dimension is projected out (the
    reference's 6-DoF _fix_scale vertices). K <= dense_max_nodes uses the
    dense (7K)^2 solve; larger graphs use matrix-free block-Jacobi PCG
    over the edge Jacobians (see module docstring)."""
    K = s.shape[0]

    zero7 = jnp.zeros(7)

    def gn_step(state, _):
        s, R, t = state
        si = s[edges.i]
        Ri = R[edges.i]
        ti = t[edges.i]
        sj = s[edges.j]
        Rj = R[edges.j]
        tj = t[edges.j]

        def res_fn(xi_i, xi_j, a, b, c, d, e, f, g, h, k):
            return _edge_residual(xi_i, xi_j, a, b, c, d, e, f, g, h, k)

        r = jax.vmap(
            lambda a, b, c, d, e, f, g, h, k: res_fn(zero7, zero7, a, b, c, d, e, f, g, h, k)
        )(si, Ri, ti, sj, Rj, tj, edges.meas_s, edges.meas_R, edges.meas_t)
        Ji = jax.vmap(
            lambda a, b, c, d, e, f, g, h, k: jax.jacfwd(res_fn, argnums=0)(
                zero7, zero7, a, b, c, d, e, f, g, h, k
            )
        )(si, Ri, ti, sj, Rj, tj, edges.meas_s, edges.meas_R, edges.meas_t)
        Jj = jax.vmap(
            lambda a, b, c, d, e, f, g, h, k: jax.jacfwd(res_fn, argnums=1)(
                zero7, zero7, a, b, c, d, e, f, g, h, k
            )
        )(si, Ri, ti, sj, Rj, tj, edges.meas_s, edges.meas_R, edges.meas_t)

        w = edges.valid.astype(jnp.float32) * edges.weight
        # Zero Jacobians of fixed nodes.
        Ji = jnp.where(node_fixed[edges.i][:, None, None], 0.0, Ji)
        Jj = jnp.where(node_fixed[edges.j][:, None, None], 0.0, Jj)
        if fix_scale:
            Ji = Ji.at[:, :, 6].set(0.0)
            Jj = Jj.at[:, :, 6].set(0.0)

        wJi = w[:, None, None] * Ji
        wJj = w[:, None, None] * Jj
        b = jnp.zeros((K, 7))
        b = b.at[edges.i].add(-jnp.einsum("eri,er->ei", wJi, r))
        b = b.at[edges.j].add(-jnp.einsum("eri,er->ei", wJj, r))

        pin_node = node_fixed | ~node_valid

        if K <= dense_max_nodes:
            # Assemble dense H (7K, 7K).
            H = jnp.zeros((K, 7, K, 7))
            H = H.at[edges.i, :, edges.i, :].add(jnp.einsum("eri,erj->eij", wJi, Ji))
            H = H.at[edges.j, :, edges.j, :].add(jnp.einsum("eri,erj->eij", wJj, Jj))
            H = H.at[edges.i, :, edges.j, :].add(jnp.einsum("eri,erj->eij", wJi, Jj))
            H = H.at[edges.j, :, edges.i, :].add(jnp.einsum("eri,erj->eij", wJj, Ji))

            Hm = H.reshape(7 * K, 7 * K)
            bm = b.reshape(7 * K)
            # Pin fixed / invalid / (scale when fix_scale) rows to identity.
            pin = jnp.repeat(pin_node, 7)
            if fix_scale:
                scale_dims = (jnp.arange(7 * K) % 7) == 6
                pin = pin | scale_dims
            diag = jnp.where(pin, 1.0, lam)
            Hm = Hm + jnp.diag(diag)
            Hm = jnp.where(pin[:, None] | pin[None, :], 0.0, Hm) + jnp.diag(
                jnp.where(pin, 1.0, 0.0)
            )
            bm = jnp.where(pin, 0.0, bm)
            dx = jnp.linalg.solve(Hm, bm).reshape(K, 7)
        else:
            # Matrix-free PCG: H·x from edge gathers/scatters; block-Jacobi
            # preconditioner from the (K, 7, 7) diagonal blocks.
            pin7 = jnp.broadcast_to(pin_node[:, None], (K, 7))
            if fix_scale:
                pin7 = pin7 | (jnp.arange(7) == 6)[None, :]
            bK = jnp.where(pin7, 0.0, b)

            def matvec(x):
                x = jnp.where(pin7, 0.0, x)
                u = (
                    jnp.einsum("erc,ec->er", Ji, x[edges.i])
                    + jnp.einsum("erc,ec->er", Jj, x[edges.j])
                )
                y = jnp.zeros((K, 7))
                y = y.at[edges.i].add(jnp.einsum("erc,er->ec", wJi, u))
                y = y.at[edges.j].add(jnp.einsum("erc,er->ec", wJj, u))
                y = y + lam * x
                return jnp.where(pin7, x, y)

            D = jnp.zeros((K, 7, 7))
            D = D.at[edges.i].add(jnp.einsum("eri,erj->eij", wJi, Ji))
            D = D.at[edges.j].add(jnp.einsum("eri,erj->eij", wJj, Jj))
            D = D + lam * jnp.eye(7)
            # Pinned/fixed-scale rows: identity blocks keep D invertible.
            D = jnp.where(
                pin7[:, :, None] | pin7[:, None, :],
                jnp.broadcast_to(jnp.eye(7), (K, 7, 7)),
                D,
            )
            Dinv = jnp.linalg.inv(D)

            def precond(x):
                return jnp.einsum("kij,kj->ki", Dinv, x)

            # tol must be reachable in float32 (1e-8 is not: every GN
            # iteration would burn the full cg_iters budget).
            dx, _ = jax.scipy.sparse.linalg.cg(
                matvec, bK, M=precond, maxiter=cg_iters, tol=1e-6
            )
            dx = jnp.where(pin7, 0.0, dx)

        ds, dR, dt = sim3_exp(dx)
        s_new, R_new, t_new = sim3_compose(ds, dR, dt, s, R, t)
        return (s_new, R_new, t_new), jnp.sum(w * jnp.sum(r * r, axis=-1))

    (s, R, t), errs = jax.lax.scan(gn_step, (s, R, t), None, length=iters)
    return s, R, t, errs
