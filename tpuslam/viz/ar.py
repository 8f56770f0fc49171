"""AR on the sparse map: plane detection from tracked points + cube overlay.

TPU-native equivalent of the reference's monocular AR demo
(/root/reference/Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.{h,cc}):

- `detect_plane` is ViewerAR::DetectPlane (ViewerAR.cc:344): RANSAC planes
  from the tracked map points, scored by the 20th-percentile absolute
  distance (max(0.2N, 20)-th order statistic), inliers at 1.4x the best
  score, refit by total least squares (Plane::Recompute, :516). The
  reference's 50 sequential 3-point hypotheses become one vmapped batch.
- `draw_ar_cube` replaces the GL cube (ViewerAR::DrawCube, :237) with a
  projected wireframe on the frame image, consistent with the PIL
  renderers in viz/render.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PlaneFit(NamedTuple):
    success: jnp.ndarray  # () bool
    normal: jnp.ndarray   # (3,) unit, oriented toward the camera
    origin: jnp.ndarray   # (3,) inlier centroid
    inliers: jnp.ndarray  # (N,) bool


def detect_plane(
    key: jax.Array,
    pts_w: jnp.ndarray,
    valid: jnp.ndarray,
    cam_center: jnp.ndarray,
    n_iters: int = 50,
    min_points: int = 50,
) -> PlaneFit:
    """RANSAC a dominant plane from (N, 3) world points with validity mask.

    cam_center: camera position in world coords (orients the normal so the
    cube is drawn on the visible side). Requires >= min_points valid points
    (ViewerAR.cc:367 requires 50).
    """
    N = pts_w.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # Sample 3 distinct-ish valid indices per hypothesis.
    valid_idx = jnp.argsort(~valid)  # valid slots first
    picks = jax.random.randint(key, (n_iters, 3), 0, jnp.maximum(n_valid, 3))
    sets = valid_idx[picks]  # (I, 3)

    big = jnp.float32(1e10)

    def score_one(i3):
        p0, p1, p2 = pts_w[i3[0]], pts_w[i3[1]], pts_w[i3[2]]
        nvec = jnp.cross(p1 - p0, p2 - p0)
        nn = jnp.linalg.norm(nvec)
        nvec = nvec / jnp.where(nn < 1e-9, 1.0, nn)
        d = -jnp.dot(nvec, p0)
        dist = jnp.abs(pts_w @ nvec + d)
        dist = jnp.where(valid, dist, big)
        s = jnp.sort(dist)
        nth = jnp.clip(
            jnp.maximum((0.2 * n_valid).astype(jnp.int32), 20), 0, N - 1
        )
        degenerate = nn < 1e-9
        return jnp.where(degenerate, big, s[nth]), nvec, d

    scores, normals, ds = jax.vmap(score_one)(sets)
    best = jnp.argmin(scores)
    best_score = scores[best]
    nvec, d = normals[best], ds[best]
    dist = jnp.abs(pts_w @ nvec + d)
    inliers = valid & (dist < 1.4 * best_score)

    # Refit: total least squares over inliers (Plane::Recompute) — centroid
    # plus the smallest-eigenvalue direction of the scatter matrix.
    w = inliers.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    centroid = jnp.sum(pts_w * w[:, None], axis=0) / wsum
    dp = (pts_w - centroid) * w[:, None]
    cov = dp.T @ dp / wsum
    evals, evecs = jnp.linalg.eigh(cov)
    normal = evecs[:, 0]  # smallest eigenvalue
    # Orient toward the camera (ViewerAR.cc:540-556 flips by view direction).
    to_cam = cam_center - centroid
    normal = normal * jnp.where(jnp.dot(normal, to_cam) < 0, -1.0, 1.0)

    success = (n_valid >= min_points) & (best_score < big)
    return PlaneFit(success, normal, centroid, inliers)


def plane_frame(normal: jnp.ndarray) -> jnp.ndarray:
    """(3, 3) rotation whose z-axis is the plane normal (columns = plane
    x/y/z axes in world coords), like the normal->rotation construction in
    Plane::Recompute (ViewerAR.cc:544-566)."""
    z = normal / jnp.maximum(jnp.linalg.norm(normal), 1e-9)
    up = jnp.where(jnp.abs(z[1]) < 0.9, jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    x = jnp.cross(up, z)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-9)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=1)


_CUBE_EDGES = [
    (0, 1), (1, 3), (3, 2), (2, 0),
    (4, 5), (5, 7), (7, 6), (6, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def cube_vertices(plane: PlaneFit, size: float) -> np.ndarray:
    """(8, 3) world-space vertices of a cube of side `size` resting on the
    plane at its origin."""
    Rp = np.asarray(plane_frame(plane.normal))
    o = np.asarray(plane.origin)
    h = size / 2.0
    verts = []
    for dz in (0.0, size):
        for dy in (-h, h):
            for dx in (-h, h):
                verts.append(o + Rp @ np.array([dx, dy, dz], np.float32))
    return np.asarray(verts, np.float32)


def draw_ar_cube(img, cam, R, t, plane: PlaneFit, size: float = 0.5):
    """Overlay a wireframe cube resting on the detected plane.

    img: (H, W) grayscale array or PIL Image; cam: PinholeCamera; (R, t):
    world->camera pose of the frame. Returns a PIL Image.
    """
    from PIL import Image, ImageDraw

    from tpuslam.geometry.camera import project
    from tpuslam.geometry.se3 import se3_apply

    if not isinstance(img, Image.Image):
        arr = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        img = Image.fromarray(arr).convert("RGB")
    d = ImageDraw.Draw(img)
    verts = cube_vertices(plane, size)
    Xc = np.asarray(se3_apply(jnp.asarray(R), jnp.asarray(t), jnp.asarray(verts)))
    uv = np.asarray(project(cam, jnp.asarray(Xc)))
    vis = Xc[:, 2] > 0.05
    for a, b in _CUBE_EDGES:
        if vis[a] and vis[b]:
            d.line(
                [float(uv[a, 0]), float(uv[a, 1]), float(uv[b, 0]), float(uv[b, 1])],
                fill=(255, 60, 60),
                width=2,
            )
    return img
