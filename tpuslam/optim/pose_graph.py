"""Sim3 pose-graph (essential graph) optimization.

TPU-native version of Optimizer::OptimizeEssentialGraph
(/root/reference/src/Optimizer.cc:781-1043): 7-DoF Sim3 vertices (6 when
scale is fixed for stereo/RGB-D) over loop edges + spanning tree + strong
covisibility edges, Gauss-Newton with the relative-pose residual
e_ij = log_sim3(S_ij_meas * S_i * S_j^-1). The reference builds a sparse
g2o graph and solves with Eigen Cholesky; here edge Jacobians come from
vmapped forward-mode autodiff of the exact residual and the normal system
is assembled dense ((7K)^2 — small for SLAM-scale K) and solved batched.

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
):
    """Optimize node Sim3 poses S_iw. Returns (s, R, t).

    node_fixed pins poses (the loop KF, Optimizer.cc:840). With
    fix_scale=True the scale tangent dimension is projected out (the
    reference's 6-DoF _fix_scale vertices)."""
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

        # Assemble dense H (7K, 7K), b (7K,).
        H = jnp.zeros((K, 7, K, 7))
        b = jnp.zeros((K, 7))
        wJi = w[:, None, None] * Ji
        wJj = w[:, None, None] * Jj
        H = H.at[edges.i, :, edges.i, :].add(jnp.einsum("eri,erj->eij", wJi, Ji))
        H = H.at[edges.j, :, edges.j, :].add(jnp.einsum("eri,erj->eij", wJj, Jj))
        H = H.at[edges.i, :, edges.j, :].add(jnp.einsum("eri,erj->eij", wJi, Jj))
        H = H.at[edges.j, :, edges.i, :].add(jnp.einsum("eri,erj->eij", wJj, Ji))
        b = b.at[edges.i].add(-jnp.einsum("eri,er->ei", wJi, r))
        b = b.at[edges.j].add(-jnp.einsum("eri,er->ei", wJj, r))

        Hm = H.reshape(7 * K, 7 * K)
        bm = b.reshape(7 * K)
        # Pin fixed / invalid / (scale when fix_scale) rows to identity.
        pin = jnp.repeat(node_fixed | ~node_valid, 7)
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
        ds, dR, dt = sim3_exp(dx)
        s_new, R_new, t_new = sim3_compose(ds, dR, dt, s, R, t)
        return (s_new, R_new, t_new), jnp.sum(w * jnp.sum(r * r, axis=-1))

    (s, R, t), errs = jax.lax.scan(gn_step, (s, R, t), None, length=iters)
    return s, R, t, errs
