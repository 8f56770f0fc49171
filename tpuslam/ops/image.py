"""Image primitives: separable Gaussian blur, bilinear resize, pyramid.

Replaces the OpenCV calls inside ORBextractor::ComputePyramid
(/root/reference/src/ORBextractor.cc:1342, cv::resize INTER_LINEAR) and the
pre-descriptor smoothing (ORBextractor.cc:1300-1315, cv::GaussianBlur 7x7
sigma=2, BORDER_REFLECT_101). Pure jax.numpy; all shapes static under jit.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """Matches cv::getGaussianKernel: samples of a Gaussian, normalized."""
    r = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - r
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _reflect101_pad(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 padding ('reflect' in numpy terms)."""
    return jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur of a (H, W) image, reflect-101 borders.

    Implemented as two 1-D convolutions expressed with static shifts and a
    weighted sum — XLA fuses this into a couple of vectorized passes, which
    beats a general conv lowering for tiny kernels on TPU.
    """
    k = _gaussian_kernel_1d(ksize, sigma)
    pad = ksize // 2
    p = _reflect101_pad(img, pad)
    H, W = img.shape
    # Horizontal pass.
    acc = jnp.zeros((H + 2 * pad, W), dtype=jnp.float32)
    for i in range(ksize):
        acc = acc + k[i] * jax.lax.dynamic_slice(p, (0, i), (H + 2 * pad, W))
    # Vertical pass.
    out = jnp.zeros((H, W), dtype=jnp.float32)
    for i in range(ksize):
        out = out + k[i] * jax.lax.dynamic_slice(acc, (i, 0), (H, W))
    return out


def pyramid_resize(img: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Bilinear resize (H, W) -> (new_h, new_w), cv::resize INTER_LINEAR style.

    Uses the half-pixel-center convention (same as OpenCV): source coordinate
    x_src = (x_dst + 0.5) * scale - 0.5.
    """
    H, W = img.shape
    sy = H / new_h
    sx = W / new_w
    ys = (jnp.arange(new_h, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(new_w, dtype=jnp.float32) + 0.5) * sx - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    top = img[y0i][:, x0i] * (1 - wx)[None, :] + img[y0i][:, x1i] * wx[None, :]
    bot = img[y1i][:, x0i] * (1 - wx)[None, :] + img[y1i][:, x1i] * wx[None, :]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


def pyramid_shapes(h: int, w: int, n_levels: int, scale_factor: float):
    """Static per-level (h, w) shapes, matching ORBextractor::ComputePyramid
    (/root/reference/src/ORBextractor.cc:1342): level l is the original size
    scaled by 1/scale_factor^l, rounded."""
    shapes = []
    for l in range(n_levels):
        inv = 1.0 / (scale_factor**l)
        shapes.append((int(round(h * inv)), int(round(w * inv))))
    return shapes


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float):
    """Cascaded bilinear pyramid: level l resized from level l-1 (like the
    reference, which resizes from mvImagePyramid[level-1]).

    Returns a list of (H_l, W_l) float32 arrays. The list-of-arrays form (not
    one padded tensor) keeps every downstream op at its natural static shape;
    jit unrolls the 8 levels at trace time.
    """
    img = img.astype(jnp.float32)
    shapes = pyramid_shapes(img.shape[0], img.shape[1], n_levels, scale_factor)
    levels = [img]
    for l in range(1, n_levels):
        levels.append(pyramid_resize(levels[-1], shapes[l][0], shapes[l][1]))
    return levels
