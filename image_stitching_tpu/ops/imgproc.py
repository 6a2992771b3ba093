"""Image-processing primitives: resize, dilate, grayscale, gaussian blur.

Replaces the OpenCV calls at
`/root/reference/image_stitching/image_stitching.cpp:602,619,1144,1170`
(resize INTER_LINEAR_EXACT), `:1169` (dilate 3x3), and the internal
Gaussian blurs of ORB/seam finding — as jit-friendly JAX ops.

Convention: images are float32 or uint8 arrays, HWC or HW; all functions
accept either and are safe under vmap over a leading batch axis when shapes
are static.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize", "resize_scale", "dilate3", "rgb_to_gray", "gaussian_blur",
    "gaussian_kernel1d", "box_blur", "scale_size",
]


def scale_size(h: int, w: int, scale: float) -> Tuple[int, int]:
    """OpenCV cv::resize(Size(), fx, fy) rounding: round(dim * scale)."""
    return max(1, int(round(h * scale))), max(1, int(round(w * scale)))


@functools.partial(jax.jit, static_argnums=(1,))
def resize(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with half-pixel-center sampling (INTER_LINEAR_EXACT
    semantics: src = (dst + 0.5) * scale - 0.5, edge-clamped)."""
    h, w = img.shape[:2]
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return img.astype(jnp.float32)
    x = img.astype(jnp.float32)
    sy, sx = h / oh, w / ow
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * sx - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    # Separable: rows first, then columns.
    row0 = x[y0i, :]
    row1 = x[y1i, :]
    rows = row0 + (row1 - row0) * wy.reshape(-1, *([1] * (x.ndim - 1)))
    col_shape = (1, -1) + (1,) * (x.ndim - 2)
    c0 = rows[:, x0i]
    c1 = rows[:, x1i]
    return c0 + (c1 - c0) * wx.reshape(col_shape)


def resize_scale(img: jnp.ndarray, scale: float) -> jnp.ndarray:
    h, w = img.shape[:2]
    return resize(img, scale_size(h, w, scale))


@jax.jit
def dilate3(mask: jnp.ndarray) -> jnp.ndarray:
    """3x3 morphological dilation == cv::dilate with default kernel
    (`image_stitching.cpp:1169`).  Works on HW (u8/bool/float)."""
    m = mask.astype(jnp.float32)
    while m.ndim < 4:  # NHWC for reduce_window
        m = m[None] if m.ndim == 2 else m[..., None]
    out = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                (1, 1, 1, 1), "SAME")
    out = out.reshape(mask.shape)
    return out.astype(mask.dtype)


@jax.jit
def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.601 luma (OpenCV COLOR_RGB2GRAY coefficients)."""
    img = img.astype(jnp.float32)
    return (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(xs ** 2) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0,
                  radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur with reflect-101 borders (OpenCV default)."""
    k = gaussian_kernel1d(sigma, radius)
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    xp = jnp.pad(x, [(radius, radius), (0, 0), (0, 0)], mode="reflect")
    x = sum(float(k[i]) * xp[i:i + x.shape[0]]
            for i in range(2 * radius + 1))
    xp = jnp.pad(x, [(0, 0), (radius, radius), (0, 0)], mode="reflect")
    x = sum(float(k[i]) * xp[:, i:i + x.shape[1]]
            for i in range(2 * radius + 1))
    return x[..., 0] if squeeze else x


@functools.partial(jax.jit, static_argnums=(1,))
def box_blur(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """size x size box filter (used by FAST/Harris scores)."""
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    r = size // 2
    xp = jnp.pad(x, [(r, r), (r, r), (0, 0)], mode="reflect")
    out = jax.lax.reduce_window(xp[None], 0.0, jax.lax.add,
                                (1, size, size, 1), (1, 1, 1, 1),
                                "VALID")[0] / (size * size)
    return out[..., 0] if squeeze else out
