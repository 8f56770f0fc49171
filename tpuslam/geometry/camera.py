"""Pinhole camera model with radial-tangential distortion, batched.

Covers the reference's camera handling: projection in tracking/optimization
(/root/reference/src/Optimizer.cc and Frame::isInFrustum,
/root/reference/src/Frame.cc:342) and keypoint undistortion
(Frame::UndistortKeyPoints, /root/reference/src/Frame.cc:539, which calls
cv::undistortPoints — an iterative inverse of the radtan model).

Camera intrinsics are a flat named tuple of scalars so they pass cleanly
through jit as static or traced values.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


class PinholeCamera(NamedTuple):
    """Intrinsics + radtan distortion (k1, k2, p1, p2, k3) + stereo baseline.

    Mirrors the Camera.* block of the reference YAML settings
    (/root/reference/Examples/Monocular/TUM1.yaml:5-18): fx, fy, cx, cy,
    k1, k2, p1, p2, k3, and bf = baseline * fx for stereo.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 0.0  # baseline * fx (stereo/RGB-D); 0 for mono
    width: int = 640
    height: int = 480

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def baseline(self) -> float:
        return self.bf / self.fx


def distort(cam: PinholeCamera, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r4 + cam.k3 * r6
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def project(cam: PinholeCamera, x_cam: jnp.ndarray, distorted: bool = False) -> jnp.ndarray:
    """Camera-frame 3D points (..., 3) -> pixel coords (..., 2).

    The reference projects *undistorted* keypoints everywhere after Frame
    construction, so optimization uses distorted=False; distorted=True gives
    raw-sensor pixels for rendering/synthesis.
    """
    z = x_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = x_cam[..., :2] * inv_z[..., None]
    if distorted:
        xn = distort(cam, xn)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject(cam: PinholeCamera, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixels (..., 2) + depth (...,) -> camera-frame 3D (..., 3).

    Same as Frame::UnprojectStereo (/root/reference/src/Frame.cc:898).
    """
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def undistort_points(cam: PinholeCamera, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Distorted pixels (..., 2) -> undistorted pixels, fixed-point iteration.

    Matches cv::undistortPoints semantics used by Frame::UndistortKeyPoints
    (/root/reference/src/Frame.cc:539): iteratively invert the radtan model in
    normalized coordinates. Fixed iteration count keeps it jit-static.
    """
    xd = jnp.stack([(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1)

    def body(_, xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2 + cam.k3 * r2 * r2 * r2
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        inv_radial = 1.0 / jnp.where(jnp.abs(radial) < 1e-9, 1e-9, radial)
        return jnp.stack([(xd[..., 0] - dx) * inv_radial, (xd[..., 1] - dy) * inv_radial], axis=-1)

    xn = lax.fori_loop(0, iters, body, xd)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: PinholeCamera, x_cam: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points (..., 3) -> (u_left, v, u_right) (..., 3).

    u_right = u_left - bf / z, the 'virtual right coordinate' the reference
    uses for stereo/RGB-D observations (/root/reference/src/Frame.cc:875-896).
    """
    uv = project(cam, x_cam)
    z = jnp.where(jnp.abs(x_cam[..., 2]) < 1e-9, 1e-9, x_cam[..., 2])
    ur = uv[..., 0] - cam.bf / z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)
