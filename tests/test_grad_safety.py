"""Gradient safety at singularities (jnp.where does NOT block NaN grads
from the untaken branch — the recurring JAX bug class; tpuslam guards with
pre-sqrt clamping in geometry/se3._sinc_factors etc.)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.geometry.se3 import se3_exp, se3_log
from tpuslam.optim.pose import PoseObs, _residual_jacobian
from tpuslam.sfm import horn_sim3


def test_se3_exp_grad_at_zero_twist():
    g = jax.grad(lambda xi: jnp.sum(se3_exp(xi)[0]) + jnp.sum(se3_exp(xi)[1]))(
        jnp.zeros(6)
    )
    assert np.all(np.isfinite(np.asarray(g)))
    # d(translation)/dv at xi=0 is the identity (V -> I).
    np.testing.assert_allclose(np.asarray(g)[3:], 1.0, atol=1e-6)


def test_se3_log_grad_at_identity():
    g = jax.grad(lambda t: jnp.sum(se3_log(jnp.eye(3), t)))(jnp.full(3, 1e-9))
    assert np.all(np.isfinite(np.asarray(g)))


def test_pose_residual_grad_at_zero_depth():
    cam = PinholeCamera(fx=100.0, fy=100.0, cx=50.0, cy=50.0)
    pts = jnp.asarray([[0.0, 0.0, 1e-8], [0.1, 0.1, 2.0]])
    obs = PoseObs(
        pts,
        jnp.asarray([[50.0, 50.0, -1.0], [55.0, 55.0, -1.0]]),
        jnp.ones(2),
        jnp.ones(2, bool),
    )

    def loss(t):
        r, J, st = _residual_jacobian(cam, jnp.eye(3), t, obs)
        return jnp.sum(r**2)

    g = jax.grad(loss)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_horn_sim3_grad_at_perfect_alignment(rng):
    x = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))

    def loss(dx):
        s, R, t = horn_sim3(x + dx, x, jnp.ones(10), fix_scale=False)
        return jnp.sum(R) + s

    g = jax.grad(loss)(jnp.zeros((10, 3)))
    assert np.all(np.isfinite(np.asarray(g)))
