"""Tests for the geometric solvers: two-view init, EPnP RANSAC, Horn Sim3."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.geometry import se3_exp, se3_apply, so3_exp, PinholeCamera, project
from tpuslam.sfm import initialize_two_view, pnp_ransac, sim3_ransac, horn_sim3

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def rot_err_deg(R1, R2):
    c = (np.trace(np.asarray(R1).T @ np.asarray(R2)) - 1) / 2
    return np.rad2deg(np.arccos(np.clip(c, -1, 1)))


def dir_err_deg(t1, t2):
    t1 = np.asarray(t1) / max(np.linalg.norm(t1), 1e-12)
    t2 = np.asarray(t2) / max(np.linalg.norm(t2), 1e-12)
    return np.rad2deg(np.arccos(np.clip(abs(np.dot(t1, t2)), -1, 1)))


class TestTwoViewInit:
    def _project_pair(self, rng, X, xi2, noise=0.5, n_out=0):
        R2, t2 = se3_exp(jnp.asarray(xi2))
        uv1 = np.array(project(CAM, jnp.asarray(X)))
        uv2 = np.array(project(CAM, se3_apply(R2, t2, jnp.asarray(X))))
        uv1 += rng.normal(size=uv1.shape).astype(np.float32) * noise
        uv2 += rng.normal(size=uv2.shape).astype(np.float32) * noise
        if n_out:
            idx = rng.choice(len(X), n_out, replace=False)
            uv2[idx] += rng.uniform(30, 120, size=(n_out, 2)).astype(np.float32)
        return uv1, uv2, np.asarray(R2), np.asarray(t2)

    def test_general_scene_uses_f(self, rng):
        X = np.stack(
            [rng.uniform(-3, 3, 150), rng.uniform(-2, 2, 150), rng.uniform(4, 12, 150)],
            -1,
        ).astype(np.float32)
        xi2 = np.array([0.02, -0.05, 0.01, 0.6, 0.05, 0.1], np.float32)
        uv1, uv2, R_gt, t_gt = self._project_pair(rng, X, xi2)
        res = initialize_two_view(
            jax.random.PRNGKey(0), CAM.K, jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(X), bool),
        )
        assert bool(res.success)
        assert not bool(res.is_h)
        assert rot_err_deg(res.R, R_gt) < 1.0
        assert dir_err_deg(res.t, t_gt) < 3.0
        # Triangulated structure should match up to the global scale.
        inl = np.asarray(res.inliers)
        assert inl.sum() > 100
        Xr = np.asarray(res.points)[inl]
        s = np.median(X[inl][:, 2] / Xr[:, 2])
        err = np.linalg.norm(s * Xr - X[inl], axis=-1)
        assert np.median(err) < 0.15

    def test_planar_scene_uses_h(self, rng):
        X = np.stack(
            [rng.uniform(-3, 3, 150), rng.uniform(-2, 2, 150), np.full(150, 6.0)], -1
        ).astype(np.float32)
        X[:, 2] += rng.normal(size=150).astype(np.float32) * 0.01
        xi2 = np.array([0.03, -0.06, 0.02, 0.5, 0.1, 0.05], np.float32)
        uv1, uv2, R_gt, t_gt = self._project_pair(rng, X, xi2, noise=0.3)
        res = initialize_two_view(
            jax.random.PRNGKey(1), CAM.K, jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(X), bool),
        )
        assert bool(res.success)
        assert bool(res.is_h)
        assert rot_err_deg(res.R, R_gt) < 1.5
        assert dir_err_deg(res.t, t_gt) < 3.0

    def test_rejects_pure_rotation(self, rng):
        """No parallax => initialization must fail."""
        X = np.stack(
            [rng.uniform(-3, 3, 150), rng.uniform(-2, 2, 150), rng.uniform(4, 12, 150)],
            -1,
        ).astype(np.float32)
        xi2 = np.array([0.02, -0.05, 0.03, 0.0, 0.0, 0.0], np.float32)  # rotation only
        uv1, uv2, _, _ = self._project_pair(rng, X, xi2, noise=0.3)
        res = initialize_two_view(
            jax.random.PRNGKey(2), CAM.K, jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(X), bool),
        )
        assert not bool(res.success)

    def test_with_outliers(self, rng):
        X = np.stack(
            [rng.uniform(-3, 3, 200), rng.uniform(-2, 2, 200), rng.uniform(4, 12, 200)],
            -1,
        ).astype(np.float32)
        xi2 = np.array([0.02, -0.05, 0.01, 0.6, 0.05, 0.1], np.float32)
        uv1, uv2, R_gt, t_gt = self._project_pair(rng, X, xi2, noise=0.4, n_out=30)
        res = initialize_two_view(
            jax.random.PRNGKey(3), CAM.K, jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(len(X), bool),
        )
        assert bool(res.success)
        assert rot_err_deg(res.R, R_gt) < 1.0
        assert dir_err_deg(res.t, t_gt) < 3.0


class TestPnP:
    def test_recovers_pose(self, rng):
        n = 100
        X = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], -1
        ).astype(np.float32)
        xi = jnp.array([0.3, -0.2, 0.1, 0.4, -0.3, 0.2])
        R_gt, t_gt = se3_exp(xi)
        uv = np.array(project(CAM, se3_apply(R_gt, t_gt, jnp.asarray(X))))
        uv += rng.normal(size=uv.shape).astype(np.float32) * 0.5
        res = pnp_ransac(
            jax.random.PRNGKey(0), CAM.K, jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(n), jnp.ones(n, bool),
        )
        assert bool(res.success)
        assert int(res.n_inliers) > 90
        assert rot_err_deg(res.R, R_gt) < 0.5
        assert np.linalg.norm(np.asarray(res.t) - np.asarray(t_gt)) < 0.05

    def test_with_outliers(self, rng):
        n = 100
        X = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], -1
        ).astype(np.float32)
        xi = jnp.array([0.1, 0.2, -0.1, 0.3, 0.1, -0.2])
        R_gt, t_gt = se3_exp(xi)
        uv = np.array(project(CAM, se3_apply(R_gt, t_gt, jnp.asarray(X))))
        uv += rng.normal(size=uv.shape).astype(np.float32) * 0.5
        out = rng.choice(n, 30, replace=False)
        uv[out] += rng.uniform(25, 100, size=(30, 2)).astype(np.float32)
        res = pnp_ransac(
            jax.random.PRNGKey(1), CAM.K, jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(n), jnp.ones(n, bool),
        )
        assert bool(res.success)
        assert rot_err_deg(res.R, R_gt) < 1.0
        assert np.linalg.norm(np.asarray(res.t) - np.asarray(t_gt)) < 0.1
        assert np.asarray(res.inliers)[out].mean() < 0.2

    def test_insufficient_points(self, rng):
        n = 20
        X = rng.uniform(-2, 2, (n, 3)).astype(np.float32) + [0, 0, 6]
        uv = rng.uniform(0, 640, (n, 2)).astype(np.float32)  # garbage
        valid = np.zeros(n, bool)
        valid[:5] = True
        res = pnp_ransac(
            jax.random.PRNGKey(2), CAM.K, jnp.asarray(X), jnp.asarray(uv),
            jnp.ones(n), jnp.asarray(valid),
        )
        assert not bool(res.success)


class TestSim3:
    def test_horn_exact(self, rng):
        n = 30
        P1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        s_gt = 1.7
        R_gt = np.asarray(so3_exp(jnp.asarray(np.array([0.3, -0.2, 0.5], np.float32))))
        t_gt = np.array([0.4, -1.0, 2.0], np.float32)
        P2 = s_gt * P1 @ R_gt.T + t_gt
        s, R, t = horn_sim3(jnp.asarray(P1), jnp.asarray(P2), jnp.ones(n))
        assert abs(float(s) - s_gt) < 1e-3
        assert rot_err_deg(R, R_gt) < 0.1
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)

    def test_horn_fix_scale(self, rng):
        n = 30
        P1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        R_gt = np.asarray(so3_exp(jnp.asarray(np.array([0.1, 0.2, -0.3], np.float32))))
        t_gt = np.array([1.0, 0.5, -0.5], np.float32)
        P2 = P1 @ R_gt.T + t_gt
        s, R, t = horn_sim3(jnp.asarray(P1), jnp.asarray(P2), jnp.ones(n), fix_scale=True)
        assert float(s) == 1.0
        assert rot_err_deg(R, R_gt) < 0.1

    def test_ransac_with_outliers(self, rng):
        n = 80
        # Points in camera-1 frame, in front of the camera.
        X1 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)], -1
        ).astype(np.float32)
        s_gt = 1.3
        R_gt = np.asarray(so3_exp(jnp.asarray(np.array([0.05, -0.1, 0.03], np.float32))))
        t_gt = np.array([0.3, -0.1, 0.5], np.float32)
        X2 = s_gt * X1 @ R_gt.T + t_gt
        # Corrupt some correspondences.
        out = rng.choice(n, 20, replace=False)
        X2c = X2.copy()
        X2c[out] += rng.uniform(1, 3, size=(20, 3)).astype(np.float32)
        uv1 = np.array(project(CAM, jnp.asarray(X1)))
        uv2 = np.array(project(CAM, jnp.asarray(X2c)))
        res = sim3_ransac(
            jax.random.PRNGKey(0), CAM.K,
            jnp.asarray(X1), jnp.asarray(X2c), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.full(n, 9.21), jnp.full(n, 9.21), jnp.ones(n, bool),
        )
        assert bool(res.success)
        assert abs(float(res.s) - s_gt) < 0.02
        assert rot_err_deg(res.R, R_gt) < 0.5
        assert np.asarray(res.inliers)[out].mean() < 0.2


class TestOptimizeSim3:
    def test_refines_noisy_estimate(self, rng):
        from tpuslam.sfm.sim3solver import optimize_sim3

        n = 60
        X1 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)], -1
        ).astype(np.float32)
        s_gt = 1.25
        R_gt = np.asarray(so3_exp(jnp.asarray(np.array([0.04, -0.08, 0.02], np.float32))))
        t_gt = np.array([0.2, -0.1, 0.4], np.float32)
        X2 = s_gt * X1 @ R_gt.T + t_gt
        uv1 = np.array(project(CAM, jnp.asarray(X1)))
        uv2 = np.array(project(CAM, jnp.asarray(X2)))
        uv1 += rng.normal(size=uv1.shape).astype(np.float32) * 0.3
        uv2 += rng.normal(size=uv2.shape).astype(np.float32) * 0.3
        # Perturbed start.
        R0 = np.asarray(so3_exp(jnp.asarray(np.array([0.01, 0.02, -0.01], np.float32)))) @ R_gt
        s, R, t, inl, n_inl = optimize_sim3(
            CAM.K, jnp.asarray(s_gt * 1.05), jnp.asarray(R0), jnp.asarray(t_gt + 0.05),
            jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
        )
        assert int(n_inl) > 50
        assert abs(float(s) - s_gt) < 0.01
        assert rot_err_deg(R, R_gt) < 0.3
        assert np.linalg.norm(np.asarray(t) - t_gt) < 0.03

    def test_fix_scale_stays_one(self, rng):
        from tpuslam.sfm.sim3solver import optimize_sim3

        n = 40
        X1 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 9, n)], -1
        ).astype(np.float32)
        R_gt = np.asarray(so3_exp(jnp.asarray(np.array([0.02, -0.05, 0.01], np.float32))))
        t_gt = np.array([0.1, 0.0, 0.2], np.float32)
        X2 = X1 @ R_gt.T + t_gt
        uv1 = np.array(project(CAM, jnp.asarray(X1)))
        uv2 = np.array(project(CAM, jnp.asarray(X2)))
        s, R, t, inl, n_inl = optimize_sim3(
            CAM.K, jnp.asarray(1.0), jnp.asarray(R_gt), jnp.asarray(t_gt + 0.03),
            jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool), fix_scale=True,
        )
        assert abs(float(s) - 1.0) < 1e-6
        assert np.linalg.norm(np.asarray(t) - t_gt) < 0.01
