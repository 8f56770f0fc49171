"""Synthetic scene renderer for integration tests (no datasets on disk).

Renders a two-depth textured 'step wall' scene by ray casting: plane A at
z=z_near for world x < 0, plane B at z=z_far elsewhere. Non-planar depth
structure makes monocular initialization pick the fundamental-matrix path
and gives parallax for triangulation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.ops.image import gaussian_blur


def make_texture(rng, h=600, w=800):
    tex = rng.uniform(0, 255, (h, w)).astype(np.float32)
    tex = np.array(gaussian_blur(jnp.asarray(tex), 7, 2.0))
    for _ in range(400):
        y, x = rng.integers(5, h - 15), rng.integers(5, w - 15)
        s = int(rng.integers(3, 11))
        tex[y : y + s, x : x + s] = rng.uniform(0, 255)
    return tex


class StepWallScene:
    """Staircase of fronto-parallel textured slabs: world-x bands at varied
    depths. Depth variation across the view makes the fundamental-matrix
    model the right one for monocular init and exercises triangulation."""

    def __init__(self, rng, depths=(3.5, 5.0, 4.2, 6.5, 3.8, 5.8, 4.6, 7.0),
                 band=1.2, tex_scale=60.0, ssaa=3):
        self.textures = [make_texture(rng, 500, 500) for _ in depths]
        self.depths = depths
        self.band = band
        self.tex_scale = tex_scale
        self.ssaa = ssaa

    def render(self, cam: PinholeCamera, R, t, with_depth: bool = False):
        """Render from world->camera pose (R, t); rays hit the slab whose
        world-x band they land in (nearest intersection wins). With
        with_depth=True also returns the camera-frame z-depth image.

        Rendered with `ssaa`x supersampling (box-downsampled): point-sampled
        seam/texture edges alias with subpixel view shifts and systematically
        bias corner positions, which dominates drift at sparse keyframe
        cadence (the depth image stays point-sampled — averaging depths
        across an occlusion seam would fabricate nonexistent geometry)."""
        s = self.ssaa
        if s > 1:
            cam_hi = PinholeCamera(
                fx=cam.fx * s, fy=cam.fy * s,
                cx=cam.cx * s + (s - 1) / 2.0, cy=cam.cy * s + (s - 1) / 2.0,
                width=cam.width * s, height=cam.height * s,
            )
            out = self._render_once(cam_hi, R, t)
            out = out.reshape(cam.height, s, cam.width, s).mean(axis=(1, 3))
            if with_depth:
                _, z = self._render_once(cam, R, t, with_depth=True)
                return out, z
            return out
        return self._render_once(cam, R, t, with_depth)

    def _render_once(self, cam: PinholeCamera, R, t, with_depth: bool = False):
        H, W = cam.height, cam.width
        R = np.asarray(R)
        t = np.asarray(t)
        uu, vv = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        C = -R.T @ t
        d = R.T @ np.stack(
            [(uu - cam.cx) / cam.fx, (vv - cam.cy) / cam.fy, np.ones_like(uu)], 0
        ).reshape(3, -1)
        nb = len(self.depths)
        x_lo = -0.5 * nb * self.band
        out = np.zeros(H * W, np.float32)
        zbuf = np.zeros(H * W, np.float32)
        best_lam = np.full(H * W, np.inf, np.float32)
        for i, z_plane in enumerate(self.depths):
            lam = (z_plane - C[2]) / np.where(np.abs(d[2]) < 1e-9, 1e-9, d[2])
            P = C[:, None] + lam * d
            band_idx = np.floor((P[0] - x_lo) / self.band)
            in_band = np.clip(band_idx, 0, nb - 1) == i
            hit = (lam > 0) & in_band & (lam < best_lam)
            tex = self.textures[i]
            th, tw = tex.shape
            tx = np.clip(P[0] * self.tex_scale + tw / 2, 0, tw - 2)
            ty = np.clip(P[1] * self.tex_scale + th / 2, 0, th - 2)
            x0 = tx.astype(int)
            y0 = ty.astype(int)
            wx = tx - x0
            wy = ty - y0
            val = (
                tex[y0, x0] * (1 - wx) * (1 - wy)
                + tex[y0, x0 + 1] * wx * (1 - wy)
                + tex[y0 + 1, x0] * (1 - wx) * wy
                + tex[y0 + 1, x0 + 1] * wx * wy
            )
            out = np.where(hit, val, out)
            z_cam = (R[2] @ P) + t[2]
            zbuf = np.where(hit, z_cam, zbuf)
            best_lam = np.where(hit, lam, best_lam)
        if with_depth:
            return out.reshape(H, W), zbuf.reshape(H, W)
        return out.reshape(H, W)


def orbit_trajectory(n_frames, step=0.04, yaw_rate=0.004):
    """World->camera poses for a gentle lateral translation with slow yaw."""
    from tpuslam.geometry.se3 import so3_exp

    poses = []
    for i in range(n_frames):
        w = np.array([0.0, yaw_rate * i, 0.0], np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        C = np.array([step * i, 0.01 * np.sin(i * 0.3), 0.002 * i], np.float32)
        t = -R @ C
        poses.append((R, t))
    return poses
