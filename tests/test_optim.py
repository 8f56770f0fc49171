"""Tests for pose-only optimization and bundle adjustment on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.geometry import se3_exp, se3_apply, so3_exp, PinholeCamera, project
from tpuslam.geometry.camera import project_stereo
from tpuslam.optim import pose_optimization, PoseObs, BAProblem, bundle_adjustment

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0)


def make_scene(rng, n_pts=200, depth=(4.0, 10.0)):
    return np.stack(
        [
            rng.uniform(-3, 3, n_pts),
            rng.uniform(-2, 2, n_pts),
            rng.uniform(*depth, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)


def rot_err_deg(R1, R2):
    c = (np.trace(R1.T @ R2) - 1) / 2
    return np.rad2deg(np.arccos(np.clip(c, -1, 1)))


class TestPoseOptimization:
    def _run(self, rng, stereo=False, outlier_frac=0.0, noise=0.5):
        X = make_scene(rng)
        n = len(X)
        xi_gt = jnp.array([0.03, -0.05, 0.02, 0.2, -0.1, 0.15])
        R_gt, t_gt = se3_exp(xi_gt)
        p_cam = se3_apply(R_gt, t_gt, jnp.asarray(X))
        if stereo:
            uvr = np.array(project_stereo(CAM, p_cam))
        else:
            uv = np.asarray(project(CAM, p_cam))
            uvr = np.concatenate([uv, -np.ones((n, 1), np.float32)], axis=-1)
        uvr[:, :2] += rng.normal(size=(n, 2)).astype(np.float32) * noise
        n_out = int(outlier_frac * n)
        out_idx = rng.choice(n, n_out, replace=False)
        uvr[out_idx, :2] += rng.uniform(20, 80, size=(n_out, 2)).astype(np.float32)
        obs = PoseObs(
            pts_w=jnp.asarray(X),
            uvr=jnp.asarray(uvr),
            inv_sigma2=jnp.ones(n),
            valid=jnp.ones(n, bool),
        )
        # Start from a perturbed pose.
        xi0 = xi_gt + jnp.array([0.02, 0.01, -0.03, 0.1, -0.05, 0.08])
        R0, t0 = se3_exp(xi0)
        R, t, inl, n_inl = jax.jit(
            lambda R0, t0: pose_optimization(CAM, R0, t0, obs)
        )(R0, t0)
        return np.asarray(R), np.asarray(t), np.asarray(R_gt), np.asarray(t_gt), np.asarray(inl), out_idx

    def test_converges_mono(self, rng):
        R, t, R_gt, t_gt, inl, _ = self._run(rng, noise=0.3)
        assert rot_err_deg(R, R_gt) < 0.1
        assert np.linalg.norm(t - t_gt) < 0.01

    def test_converges_stereo(self, rng):
        R, t, R_gt, t_gt, inl, _ = self._run(rng, stereo=True, noise=0.3)
        assert rot_err_deg(R, R_gt) < 0.1
        assert np.linalg.norm(t - t_gt) < 0.01

    def test_rejects_outliers(self, rng):
        R, t, R_gt, t_gt, inl, out_idx = self._run(rng, outlier_frac=0.25, noise=0.3)
        assert rot_err_deg(R, R_gt) < 0.2
        assert np.linalg.norm(t - t_gt) < 0.02
        # Outliers classified out.
        assert inl[out_idx].mean() < 0.1
        inl_idx = np.setdiff1d(np.arange(200), out_idx)
        assert inl[inl_idx].mean() > 0.9

    def test_invalid_edges_ignored(self, rng):
        X = make_scene(rng, 100)
        xi_gt = jnp.array([0.0, 0.0, 0.0, 0.1, 0.0, 0.0])
        R_gt, t_gt = se3_exp(xi_gt)
        uv = np.asarray(project(CAM, se3_apply(R_gt, t_gt, jnp.asarray(X))))
        uvr = np.concatenate([uv, -np.ones((100, 1), np.float32)], axis=-1)
        # Garbage in invalid rows must not affect the solution.
        uvr[50:] = 1e6
        valid = np.zeros(100, bool)
        valid[:50] = True
        obs = PoseObs(jnp.asarray(X), jnp.asarray(uvr), jnp.ones(100), jnp.asarray(valid))
        R, t, inl, n = pose_optimization(CAM, jnp.eye(3), jnp.zeros(3), obs)
        assert rot_err_deg(np.asarray(R), np.asarray(R_gt)) < 0.1
        assert np.linalg.norm(np.asarray(t) - np.asarray(t_gt)) < 0.01
        assert int(n) == 50


def make_ba_problem(rng, K=6, P=150, noise=0.3, mono=True, perturb=True):
    """K cameras in an arc observing P points."""
    X_gt = make_scene(rng, P, depth=(5.0, 12.0))
    Rs, ts = [], []
    for k in range(K):
        w = np.array([0.0, -0.04 * k, 0.0], np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        t = np.array([-0.3 * k, 0.0, 0.0], np.float32)
        Rs.append(R)
        ts.append(t)
    R_gt = np.stack(Rs)
    t_gt = np.stack(ts)

    kf, pt, uvr = [], [], []
    for k in range(K):
        p_cam = se3_apply(jnp.asarray(R_gt[k]), jnp.asarray(t_gt[k]), jnp.asarray(X_gt))
        uv = np.asarray(project(CAM, p_cam))
        vis = (
            (uv[:, 0] > 10) & (uv[:, 0] < 630) & (uv[:, 1] > 10) & (uv[:, 1] < 470)
        )
        for j in np.nonzero(vis)[0]:
            kf.append(k)
            pt.append(j)
            uvr.append([uv[j, 0] + rng.normal() * noise, uv[j, 1] + rng.normal() * noise, -1.0])
    E = len(kf)
    # Perturb initial estimates.
    if perturb:
        R0 = np.stack(
            [
                np.asarray(so3_exp(jnp.asarray(rng.normal(size=3).astype(np.float32) * 0.01)))
                @ R_gt[k]
                for k in range(K)
            ]
        )
        t0 = t_gt + rng.normal(size=t_gt.shape).astype(np.float32) * 0.05
        X0 = X_gt + rng.normal(size=X_gt.shape).astype(np.float32) * 0.1
        R0[0], t0[0] = R_gt[0], t_gt[0]  # gauge
    else:
        R0, t0, X0 = R_gt.copy(), t_gt.copy(), X_gt.copy()
    fixed_kf = np.zeros(K, bool)
    fixed_kf[0] = True
    prob = BAProblem(
        R=jnp.asarray(R0),
        t=jnp.asarray(t0),
        X=jnp.asarray(X0),
        kf=jnp.asarray(np.array(kf, np.int32)),
        pt=jnp.asarray(np.array(pt, np.int32)),
        uvr=jnp.asarray(np.array(uvr, np.float32)),
        inv_sigma2=jnp.ones(E),
        valid=jnp.ones(E, bool),
        fixed_kf=jnp.asarray(fixed_kf),
        fixed_pt=jnp.zeros(P, bool),
    )
    return prob, R_gt, t_gt, X_gt


class TestBundleAdjustment:
    def test_reduces_reprojection_error(self, rng):
        prob, R_gt, t_gt, X_gt = make_ba_problem(rng, noise=0.0)
        _, _, _, chi2_before = bundle_adjustment(CAM, prob, iters=0)
        R, t, X, chi2 = jax.jit(lambda p: bundle_adjustment(CAM, p, iters=12))(prob)
        assert float(jnp.sum(chi2)) < 0.01 * float(jnp.sum(chi2_before))

    def test_recovers_poses(self, rng):
        prob, R_gt, t_gt, X_gt = make_ba_problem(rng, noise=0.2)
        R, t, X, chi2 = bundle_adjustment(CAM, prob, iters=15)
        R, t = np.asarray(R), np.asarray(t)
        # Mono BA with a single fixed camera has a free global scale (same
        # gauge as the reference's GBA): compare up to one scalar.
        s = np.median(
            [np.linalg.norm(t_gt[k]) / max(np.linalg.norm(t[k]), 1e-9) for k in range(1, len(R_gt))]
        )
        for k in range(1, len(R_gt)):
            assert rot_err_deg(R[k], R_gt[k]) < 0.2, f"kf {k}"
            assert np.linalg.norm(s * t[k] - t_gt[k]) < 0.02, f"kf {k}"

    def test_fixed_kf_unchanged(self, rng):
        prob, R_gt, t_gt, _ = make_ba_problem(rng)
        R, t, X, _ = bundle_adjustment(CAM, prob, iters=5)
        np.testing.assert_allclose(np.asarray(R)[0], R_gt[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(t)[0], t_gt[0], atol=1e-6)

    def test_fixed_points_unchanged(self, rng):
        prob, _, _, X_gt = make_ba_problem(rng)
        fixed_pt = np.zeros(prob.X.shape[0], bool)
        fixed_pt[:20] = True
        prob = prob._replace(fixed_pt=jnp.asarray(fixed_pt))
        X0 = np.asarray(prob.X).copy()
        _, _, X, _ = bundle_adjustment(CAM, prob, iters=5)
        np.testing.assert_allclose(np.asarray(X)[:20], X0[:20], atol=1e-6)


class TestDenseSchurBA:
    """dense_schur_bundle_adjustment: the explicit reduced-camera-system
    solver used by local BA (scatter-free pose-side assembly + direct
    solve). Must reach the same optima as the CG solver."""

    def _active(self, prob, a=8):
        K = prob.R.shape[0]
        act = [k for k in range(K) if not bool(prob.fixed_kf[k])][:a]
        act += [-1] * (a - len(act))
        return jnp.asarray(np.array(act, np.int32))

    def test_reduces_reprojection_error(self, rng):
        from tpuslam.optim.ba import dense_schur_bundle_adjustment

        prob, *_ = make_ba_problem(rng, noise=0.0)
        _, _, _, chi2_before = bundle_adjustment(CAM, prob, iters=0)
        R, t, X, chi2 = jax.jit(
            lambda p, a: dense_schur_bundle_adjustment(CAM, p, a, iters=12)
        )(prob, self._active(prob))
        assert float(jnp.sum(chi2)) < 0.01 * float(jnp.sum(chi2_before))

    def test_matches_cg_solver(self, rng):
        from tpuslam.optim.ba import dense_schur_bundle_adjustment

        prob, R_gt, t_gt, X_gt = make_ba_problem(rng, noise=0.2)
        R1, t1, X1, _ = bundle_adjustment(CAM, prob, iters=15, cg_iters=80)
        R2, t2, X2, _ = dense_schur_bundle_adjustment(
            CAM, prob, self._active(prob), iters=15
        )
        # Both converge to the same stationary point (mono gauge freedom
        # handled by the same fixed KF 0).
        for k in range(1, R_gt.shape[0]):
            assert rot_err_deg(np.asarray(R1)[k], np.asarray(R2)[k]) < 0.1
            assert np.linalg.norm(np.asarray(t1)[k] - np.asarray(t2)[k]) < 0.02

    def test_recovers_poses(self, rng):
        from tpuslam.optim.ba import dense_schur_bundle_adjustment

        prob, R_gt, t_gt, X_gt = make_ba_problem(rng, noise=0.2)
        R, t, X, _ = dense_schur_bundle_adjustment(
            CAM, prob, self._active(prob), iters=15
        )
        R, t = np.asarray(R), np.asarray(t)
        s = np.median(
            [np.linalg.norm(t_gt[k]) / max(np.linalg.norm(t[k]), 1e-9)
             for k in range(1, len(R_gt))]
        )
        for k in range(1, len(R_gt)):
            assert rot_err_deg(R[k], R_gt[k]) < 0.2, f"kf {k}"
            assert np.linalg.norm(s * t[k] - t_gt[k]) < 0.02, f"kf {k}"

    def test_inactive_kf_held_fixed(self, rng):
        from tpuslam.optim.ba import dense_schur_bundle_adjustment

        prob, R_gt, t_gt, _ = make_ba_problem(rng)
        K = prob.R.shape[0]
        # Only KFs 1 and 2 active: all others (incl. fixed 0) must not move.
        act = jnp.asarray(np.array([1, 2, -1, -1], np.int32))
        R0 = np.asarray(prob.R).copy()
        t0 = np.asarray(prob.t).copy()
        R, t, X, _ = dense_schur_bundle_adjustment(CAM, prob, act, iters=5)
        for k in [0] + list(range(3, K)):
            np.testing.assert_allclose(np.asarray(R)[k], R0[k], atol=1e-5)
            np.testing.assert_allclose(np.asarray(t)[k], t0[k], atol=1e-5)
