"""Synthetic problem builders shared by tests, benchmarks, and the driver
entry points (__graft_entry__) — importable from anywhere, unlike the
repo-root scratch module."""

from __future__ import annotations

import numpy as np


def synthetic_ba_problem(rng, K=6, P=128, n_obs_per_kf=64):
    """Small consistent BA problem (cameras in an arc observing a cloud).
    Returns (cam, BAProblem)."""
    import jax.numpy as jnp

    from tpuslam.geometry import project, se3_apply, so3_exp
    from tpuslam.geometry.camera import PinholeCamera
    from tpuslam.optim.ba import BAProblem

    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
    X = np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(5, 12, P)], -1
    ).astype(np.float32)
    kf, pt, uvr = [], [], []
    Rs, ts = [], []
    for k in range(K):
        R = np.asarray(so3_exp(jnp.asarray(np.array([0, -0.03 * k, 0], np.float32))))
        t = np.array([-0.25 * k, 0, 0], np.float32)
        Rs.append(R)
        ts.append(t)
        uv = np.asarray(
            project(cam, se3_apply(jnp.asarray(R), jnp.asarray(t), jnp.asarray(X)))
        )
        sel = rng.choice(P, n_obs_per_kf, replace=False)
        for j in sel:
            kf.append(k)
            pt.append(j)
            uvr.append(
                [uv[j, 0] + rng.normal() * 0.3, uv[j, 1] + rng.normal() * 0.3, -1.0]
            )
    E = len(kf)
    fixed_kf = np.zeros(K, bool)
    fixed_kf[0] = True
    prob = BAProblem(
        R=jnp.asarray(np.stack(Rs)),
        t=jnp.asarray(np.stack(ts)),
        X=jnp.asarray(X + rng.normal(size=X.shape).astype(np.float32) * 0.05),
        kf=jnp.asarray(np.array(kf, np.int32)),
        pt=jnp.asarray(np.array(pt, np.int32)),
        uvr=jnp.asarray(np.array(uvr, np.float32)),
        inv_sigma2=jnp.ones(E),
        valid=jnp.ones(E, bool),
        fixed_kf=jnp.asarray(fixed_kf),
        fixed_pt=jnp.zeros(P, bool),
    )
    return cam, prob


def map_from_ba_problem(cam, prob, max_kf, n_kp, max_pt):
    """Build a consistent MapState from a synthetic BA problem so the
    Tracker's own BA entry points can run on it (edges grouped per KF)."""
    import jax.numpy as jnp

    from tpuslam.mapstate.core import make_empty_map

    K = prob.R.shape[0]
    P = prob.X.shape[0]
    kf = np.asarray(prob.kf)
    pt = np.asarray(prob.pt)
    uvr = np.asarray(prob.uvr)
    obs = np.full((max_kf, n_kp), -1, np.int32)
    xy = np.zeros((max_kf, n_kp, 2), np.float32)
    ur = np.full((max_kf, n_kp), -1.0, np.float32)
    kp_valid = np.zeros((max_kf, n_kp), bool)
    slot = np.zeros(max_kf, np.int64)
    for e in range(len(kf)):
        k, s = int(kf[e]), int(slot[kf[e]])
        if s >= n_kp:
            continue
        obs[k, s] = pt[e]
        xy[k, s] = uvr[e, :2]
        ur[k, s] = uvr[e, 2]
        kp_valid[k, s] = True
        slot[k] += 1
    m = make_empty_map(max_kf, n_kp, max_pt)
    return m._replace(
        kf_R=m.kf_R.at[:K].set(prob.R),
        kf_t=m.kf_t.at[:K].set(prob.t),
        kf_valid=m.kf_valid.at[:K].set(True),
        kf_frame_id=m.kf_frame_id.at[:K].set(jnp.arange(K, dtype=jnp.int32)),
        kf_kp_xy=jnp.asarray(xy),
        kf_kp_uright=jnp.asarray(ur),
        kf_kp_valid=jnp.asarray(kp_valid),
        kf_obs_pt=jnp.asarray(obs),
        pt_xyz=m.pt_xyz.at[:P].set(prob.X),
        pt_valid=m.pt_valid.at[:P].set(True),
        pt_max_dist=m.pt_max_dist.at[:P].set(100.0),
        n_kf=jnp.int32(K),
        n_pt=jnp.int32(P),
    )
