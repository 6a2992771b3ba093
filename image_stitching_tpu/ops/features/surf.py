"""SURF-family detector/descriptor (speeded-up robust features).

Covers the reference's optional ``xfeatures2d::SURF::create()`` path
(`image_stitching.cpp:551-556`, the default when OpenCV nonfree is
available, match_conf 0.65).  Determinant-of-Hessian scale stack (Gaussian
smoothing ladder), Haar-wavelet dominant orientation, and the 64-dim
(4x4 x [sum dx, sum |dx|, sum dy, sum |dy|]) descriptor, L2-matched.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..imgproc import gaussian_blur
from .hessian import det_hessian, top_k_keypoints
from .types import Features

__all__ = ["surf_detect_and_describe"]

_SCALES = (1.2, 2.0, 3.2, 4.8)


@functools.partial(jax.jit, static_argnames=("n_features", "base_hw"))
def _surf_impl(gray, *, n_features: int, base_hw: Tuple[int, int]):
    img = gray.astype(jnp.float32)
    maps = []
    for s in _SCALES:
        radius = max(1, min(int(2 * s), 8))
        smooth = gaussian_blur(img, s, radius)
        maps.append(det_hessian(smooth) * (s ** 2))
    xy, resp, sc, valid = top_k_keypoints(maps, n_features, border=18)

    # Gradients of a mildly smoothed image drive orientation + descriptor.
    base = gaussian_blur(img, 1.2, 3)
    p = jnp.pad(base, 1, mode="edge")
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])

    # Dominant orientation: vector sum of gradients in a radius-9 disk.
    ys, xs = np.mgrid[-9:10, -9:10]
    disk = (xs ** 2 + ys ** 2 <= 81)
    offs = jnp.asarray(np.stack([xs[disk], ys[disk]], -1))
    pad = 12
    gxp = jnp.pad(gx, pad)
    gyp = jnp.pad(gy, pad)
    pts = jnp.round(xy).astype(jnp.int32) + pad
    sy = pts[:, None, 1] + offs[None, :, 1]
    sx = pts[:, None, 0] + offs[None, :, 0]
    angle = jnp.arctan2(jnp.sum(gyp[sy, sx], 1), jnp.sum(gxp[sy, sx], 1))

    # Descriptor: 4x4 cells of a rotated 20x20 window; per-cell
    # [sum dx', sum |dx'|, sum dy', sum |dy'|] with gradients rotated into
    # the keypoint frame.
    half = 10
    ys2, xs2 = np.mgrid[-half:half, -half:half] + 0.5
    offs2 = jnp.asarray(np.stack([xs2.ravel(), ys2.ravel()], -1,
                                 ).astype(np.float32))
    cell_x = np.clip(((xs2.ravel() + half) // 5).astype(np.int64), 0, 3)
    cell_y = np.clip(((ys2.ravel() + half) // 5).astype(np.int64), 0, 3)
    cell = jnp.asarray((cell_y * 4 + cell_x).astype(np.int32))
    pad2 = 18
    gxp2 = jnp.pad(gx, pad2)
    gyp2 = jnp.pad(gy, pad2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    rx = ca[:, None] * offs2[None, :, 0] - sa[:, None] * offs2[None, :, 1]
    ry = sa[:, None] * offs2[None, :, 0] + ca[:, None] * offs2[None, :, 1]
    sxi = jnp.round(xy[:, 0:1] + rx).astype(jnp.int32) + pad2
    syi = jnp.round(xy[:, 1:2] + ry).astype(jnp.int32) + pad2
    gxs = gxp2[syi, sxi]
    gys = gyp2[syi, sxi]
    dx_r = ca[:, None] * gxs + sa[:, None] * gys
    dy_r = -sa[:, None] * gxs + ca[:, None] * gys

    def scatter(vals):
        return jax.vmap(lambda c, v: jnp.zeros(16).at[c].add(v))(  # (K,16)
            jnp.broadcast_to(cell, vals.shape), vals)
    d = jnp.concatenate([scatter(dx_r), scatter(jnp.abs(dx_r)),
                         scatter(dy_r), scatter(jnp.abs(dy_r))], axis=1)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-6)

    scale_vals = jnp.asarray(np.asarray(_SCALES, np.float32))[sc]
    return Features(xy=xy, response=jnp.where(valid, resp, 0.0),
                    angle=angle, octave=sc, size=scale_vals * 9.0,
                    desc=d, valid=valid)


def surf_detect_and_describe(gray, n_features: int = 4000) -> Features:
    gray = jnp.asarray(gray)
    return _surf_impl(gray, n_features=n_features,
                      base_hw=(gray.shape[0], gray.shape[1]))
