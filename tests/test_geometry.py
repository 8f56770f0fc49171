"""Unit tests for the geometry core (SE3/Sim3/camera/triangulation).

Golden values are computed independently with numpy/scipy-style formulas,
mirroring the reference's g2o se3quat.h / sim3.h semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuslam.geometry import (
    se3_exp,
    se3_log,
    se3_compose,
    se3_inverse,
    se3_apply,
    so3_exp,
    so3_log,
    quat_to_rotmat,
    rotmat_to_quat,
    sim3_exp,
    sim3_log,
    sim3_compose,
    sim3_inverse,
    sim3_apply,
    PinholeCamera,
    project,
    unproject,
    distort,
    undistort_points,
    triangulate_two_view,
)
from tpuslam.geometry.camera import project_stereo

jax.config.update("jax_enable_x64", False)


def random_rotations(rng, n):
    """Random rotations via QR of Gaussian matrices."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    Q *= np.sign(np.diagonal(R, axis1=-2, axis2=-1))[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q.astype(np.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = rng.normal(size=(64, 3)).astype(np.float32)
        # Keep |w| < pi for uniqueness of the log.
        w = w / (1.0 + np.linalg.norm(w, axis=-1, keepdims=True)) * 2.5
        R = so3_exp(jnp.asarray(w))
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=2e-5)

    def test_exp_is_rotation(self, rng):
        w = rng.normal(size=(32, 3)).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.eye(3)[None].repeat(32, 0), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = so3_exp(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(so3_log(R))))

    def test_near_pi(self):
        # Rotation by pi - small about a random-ish axis.
        axis = np.array([0.6, -0.64, 0.48])
        axis /= np.linalg.norm(axis)
        for theta in [np.pi - 1e-3, np.pi - 1e-5]:
            w = (theta * axis).astype(np.float32)[None]
            w2 = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
            np.testing.assert_allclose(w2, w, atol=1e-2)

    def test_known_rotation(self):
        # 90 degrees about z.
        w = jnp.array([0.0, 0.0, np.pi / 2])
        R = np.asarray(so3_exp(w))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 6)).astype(np.float32)
        xi[:, :3] *= 0.8
        R, t = se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(se3_log(R, t))
        np.testing.assert_allclose(xi2, xi, atol=5e-5)

    def test_compose_inverse(self, rng):
        R1 = jnp.asarray(random_rotations(rng, 16))
        t1 = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        Ri, ti = se3_inverse(R1, t1)
        Rc, tc = se3_compose(R1, t1, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3)[None].repeat(16, 0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)

    def test_apply_matches_matmul(self, rng):
        R = jnp.asarray(random_rotations(rng, 8))
        t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        y = se3_apply(R, t, x)
        y_ref = np.einsum("nij,nj->ni", np.asarray(R), np.asarray(x)) + np.asarray(t)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


class TestQuat:
    def test_roundtrip(self, rng):
        R = jnp.asarray(random_rotations(rng, 64))
        q = rotmat_to_quat(R)
        R2 = quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_identity(self):
        q = rotmat_to_quat(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=1e-6)

    def test_near_pi_rotations(self, rng):
        # All four Shepperd branches.
        for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0.577, 0.577, 0.577)]:
            a = np.array(axis, dtype=np.float32)
            a /= np.linalg.norm(a)
            w = jnp.asarray((np.pi - 1e-4) * a)
            R = so3_exp(w)
            q = rotmat_to_quat(R)
            np.testing.assert_allclose(np.asarray(quat_to_rotmat(q)), np.asarray(R), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(64, 7)).astype(np.float32)
        xi[:, :3] *= 0.8
        xi[:, 6] *= 0.5
        s, R, t = sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(sim3_log(s, R, t))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_identity_scale(self, rng):
        # sigma = 0 must reduce to SE3 exp.
        xi6 = rng.normal(size=(16, 6)).astype(np.float32) * 0.7
        xi7 = np.concatenate([xi6, np.zeros((16, 1), np.float32)], axis=-1)
        s, R, t = sim3_exp(jnp.asarray(xi7))
        R_se3, t_se3 = se3_exp(jnp.asarray(xi6))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_se3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_se3), atol=1e-5)

    def test_compose_inverse(self, rng):
        s = jnp.asarray(np.exp(rng.normal(size=16) * 0.3).astype(np.float32))
        R = jnp.asarray(random_rotations(rng, 16))
        t = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        si, Ri, ti = sim3_inverse(s, R, t)
        sc, Rc, tc = sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3)[None].repeat(16, 0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-4)

    def test_apply(self, rng):
        s = jnp.asarray(np.float32(2.0))[None].repeat(4)
        R = jnp.asarray(random_rotations(rng, 4))
        t = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        y = sim3_apply(s, R, t, x)
        y_ref = 2.0 * np.einsum("nij,nj->ni", np.asarray(R), np.asarray(x)) + np.asarray(t)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


TUM1 = PinholeCamera(
    fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
    k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314,
    bf=40.0, width=640, height=480,
)


class TestCamera:
    def test_project_unproject(self, rng):
        cam = TUM1
        depth = jnp.asarray(rng.uniform(0.5, 5.0, size=64).astype(np.float32))
        uv = jnp.asarray(
            np.stack(
                [rng.uniform(50, 590, size=64), rng.uniform(50, 430, size=64)], axis=-1
            ).astype(np.float32)
        )
        x = unproject(cam, uv, depth)
        uv2 = project(cam, x)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)

    def test_undistort_inverts_distort(self, rng):
        cam = TUM1
        # True (undistorted) normalized points near the center.
        xn = rng.uniform(-0.3, 0.3, size=(64, 2)).astype(np.float32)
        xd = distort(cam, jnp.asarray(xn))
        uv_dist = np.stack(
            [cam.fx * np.asarray(xd)[:, 0] + cam.cx, cam.fy * np.asarray(xd)[:, 1] + cam.cy],
            axis=-1,
        )
        uv_undist = undistort_points(cam, jnp.asarray(uv_dist.astype(np.float32)))
        uv_true = np.stack([cam.fx * xn[:, 0] + cam.cx, cam.fy * xn[:, 1] + cam.cy], axis=-1)
        np.testing.assert_allclose(np.asarray(uv_undist), uv_true, atol=0.1)

    def test_stereo_projection(self):
        cam = TUM1
        x = jnp.array([[0.5, 0.2, 2.0]])
        uvr = project_stereo(cam, x)
        uv = project(cam, x)
        np.testing.assert_allclose(np.asarray(uvr)[:, :2], np.asarray(uv), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(uvr)[0, 2], np.asarray(uv)[0, 0] - cam.bf / 2.0, atol=1e-4
        )


class TestTriangulation:
    def test_two_view(self, rng):
        cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        K = cam.K
        n = 128
        x_world = np.stack(
            [
                rng.uniform(-2, 2, size=n),
                rng.uniform(-1.5, 1.5, size=n),
                rng.uniform(4.0, 10.0, size=n),
            ],
            axis=-1,
        ).astype(np.float32)
        R1 = jnp.eye(3)[None].repeat(n, 0)
        t1 = jnp.zeros((n, 3))
        # Second camera translated along x with a small rotation.
        w = jnp.array([0.0, 0.05, 0.0])
        R2_single = so3_exp(w)
        R2 = jnp.broadcast_to(R2_single, (n, 3, 3))
        t2 = jnp.broadcast_to(jnp.array([-0.5, 0.0, 0.0]), (n, 3))
        xw = jnp.asarray(x_world)
        uv1 = project(cam, se3_apply(R1, t1, xw))
        uv2 = project(cam, se3_apply(R2, t2, xw))
        x_tri, wgt = triangulate_two_view(R1, t1, R2, t2, K, uv1, uv2)
        np.testing.assert_allclose(np.asarray(x_tri), x_world, atol=2e-2)

    def test_with_noise(self, rng):
        cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        n = 64
        x_world = np.stack(
            [rng.uniform(-1, 1, size=n), rng.uniform(-1, 1, size=n), rng.uniform(3, 6, size=n)],
            axis=-1,
        ).astype(np.float32)
        R1 = jnp.eye(3)[None].repeat(n, 0)
        t1 = jnp.zeros((n, 3))
        R2 = jnp.eye(3)[None].repeat(n, 0)
        t2 = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0]), (n, 3))
        xw = jnp.asarray(x_world)
        uv1 = project(cam, se3_apply(R1, t1, xw)) + rng.normal(size=(n, 2)).astype(np.float32) * 0.3
        uv2 = project(cam, se3_apply(R2, t2, xw)) + rng.normal(size=(n, 2)).astype(np.float32) * 0.3
        x_tri, _ = triangulate_two_view(R1, t1, R2, t2, cam.K, uv1, uv2)
        err = np.linalg.norm(np.asarray(x_tri) - x_world, axis=-1)
        assert np.median(err) < 0.1


class TestGradients:
    """NaN-at-singularity regressions: jnp.where does not block NaN grads."""

    def test_se3_exp_grad_at_zero(self):
        cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        X = jnp.array([[0.3, -0.2, 4.0], [1.0, 0.5, 6.0]])
        target = jnp.array([[350.0, 230.0], [400.0, 280.0]])

        def loss(xi):
            R, t = se3_exp(xi)
            return jnp.sum((project(cam, se3_apply(R, t, X)) - target) ** 2)

        g = jax.grad(loss)(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0.0)

    def test_sim3_exp_grad_at_zero(self):
        def loss(xi):
            s, R, t = sim3_exp(xi)
            return jnp.sum(sim3_apply(s, R, t, jnp.array([[1.0, 2.0, 3.0]])) ** 2)

        g = jax.grad(loss)(jnp.zeros(7))
        assert np.all(np.isfinite(np.asarray(g)))
