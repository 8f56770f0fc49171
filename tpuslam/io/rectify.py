"""Stereo rectification maps + remap (EuRoC online rectification).

Counterpart of the cv::initUndistortRectifyMap + cv::remap calls in the
reference's EuRoC stereo driver
(/root/reference/Examples/Stereo/stereo_euroc.cc:63-100): given each
camera's K, D (radtan), rectifying rotation R and new projection P from the
settings YAML, build per-pixel source-coordinate maps once (numpy, host) and
remap frames bilinearly (vectorized numpy — the reference also remaps on
CPU).
"""

from __future__ import annotations

import numpy as np


def init_rectify_map(K, D, R, P, width: int, height: int):
    """Build (map_x, map_y) float32 arrays of source pixel coordinates.

    For each rectified pixel: back-project through P, rotate by R^-1 into
    the original camera, apply radtan distortion, project through K — the
    standard initUndistortRectifyMap construction.
    """
    K = np.asarray(K, np.float64)
    D = np.asarray(D, np.float64).reshape(-1)
    R = np.asarray(R, np.float64)
    P = np.asarray(P, np.float64)
    k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
    k3 = D[4] if len(D) > 4 else 0.0

    fx_n, fy_n = P[0, 0], P[1, 1]
    cx_n, cy_n = P[0, 2], P[1, 2]

    u, v = np.meshgrid(np.arange(width, dtype=np.float64),
                       np.arange(height, dtype=np.float64))
    x = (u - cx_n) / fx_n
    y = (v - cy_n) / fy_n
    ones = np.ones_like(x)
    rays = np.stack([x, y, ones], axis=0).reshape(3, -1)
    rays = R.T @ rays
    xn = rays[0] / rays[2]
    yn = rays[1] / rays[2]

    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn

    map_x = (K[0, 0] * xd + K[0, 2]).reshape(height, width).astype(np.float32)
    map_y = (K[1, 1] * yd + K[1, 2]).reshape(height, width).astype(np.float32)
    return map_x, map_y


def remap_bilinear(img: np.ndarray, map_x: np.ndarray, map_y: np.ndarray) -> np.ndarray:
    """Bilinear remap with border replication (cv::remap BORDER defaults are
    constant-0; replication avoids dark borders feeding FAST)."""
    H, W = img.shape
    x = np.clip(map_x, 0, W - 1.001)
    y = np.clip(map_y, 0, H - 1.001)
    x0 = x.astype(np.int32)
    y0 = y.astype(np.int32)
    wx = x - x0
    wy = y - y0
    out = (
        img[y0, x0] * (1 - wx) * (1 - wy)
        + img[y0, x0 + 1] * wx * (1 - wy)
        + img[y0 + 1, x0] * (1 - wx) * wy
        + img[y0 + 1, x0 + 1] * wx * wy
    )
    return out.astype(np.float32)


class StereoRectifier:
    """Precomputed rectification for a stereo pair from Settings blocks."""

    def __init__(self, left: dict, right: dict, width: int, height: int):
        self.lmx, self.lmy = init_rectify_map(
            left["K"], left["D"], left["R"], left["P"], width, height
        )
        self.rmx, self.rmy = init_rectify_map(
            right["K"], right["D"], right["R"], right["P"], width, height
        )

    def __call__(self, img_left: np.ndarray, img_right: np.ndarray):
        return (
            remap_bilinear(np.asarray(img_left, np.float32), self.lmx, self.lmy),
            remap_bilinear(np.asarray(img_right, np.float32), self.rmx, self.rmy),
        )
