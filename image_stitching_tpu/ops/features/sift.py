"""SIFT detector/descriptor in JAX (static-shaped, masked).

Covers the reference's ``SIFT::create()`` alternative
(`image_stitching.cpp:557-560`).  Standard pipeline: Gaussian scale space
-> DoG extrema (3x3x3 argmax/argmin) with contrast + edge-ratio tests ->
dominant-gradient orientation -> 4x4x8 gradient-histogram descriptor
(128-dim float, L2-matched).  All levels static; keypoints fill fixed
top-K slots ranked by |DoG| response with a validity mask.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..imgproc import gaussian_blur, resize
from .types import Features

__all__ = ["sift_detect_and_describe"]

_N_SPO = 3            # scales per octave
_SIGMA0 = 1.6
# OpenCV's final contrast check is contrastThreshold / nOctaveLayers on
# 0..1 images = 0.04 / 3 * 255 ~ 3.4 on our 0..255 scale.  (A stricter 8.0
# starved detection to ~25 extrema/octave on the synthetic captures —
# measured in tools/detector_quality.py.)
_CONTRAST = 3.4
_EDGE_R = 10.0


def _dog_stack(img: jnp.ndarray):
    """One octave: blurred stack (s+3) and DoG stack (s+2)."""
    k = 2.0 ** (1.0 / _N_SPO)
    gauss = []
    cur = img
    sigma_prev = 0.5
    for i in range(_N_SPO + 3):
        sigma_total = _SIGMA0 * (k ** i)
        sigma_diff = math.sqrt(max(sigma_total ** 2 - sigma_prev ** 2, 0.01))
        radius = max(1, min(int(3 * sigma_diff + 0.5), 8))
        cur = gaussian_blur(cur, sigma_diff, radius)
        sigma_prev = sigma_total
        gauss.append(cur)
    dog = jnp.stack([gauss[i + 1] - gauss[i]
                     for i in range(_N_SPO + 2)])
    return gauss, dog


def _extrema_mask(dog: jnp.ndarray) -> jnp.ndarray:
    """(S, H, W) -> bool mask of 26-neighborhood extrema on inner scales."""
    s, h, w = dog.shape

    def nbr_max(x):
        p = jnp.pad(x, ((1, 1), (1, 1), (1, 1)), constant_values=-jnp.inf)
        vals = []
        for ds in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if ds == dy == dx == 0:
                        continue
                    vals.append(p[1 + ds:1 + ds + s, 1 + dy:1 + dy + h,
                                  1 + dx:1 + dx + w])
        return jnp.max(jnp.stack(vals), axis=0)

    mx = nbr_max(dog)
    mn = -nbr_max(-dog)
    is_ext = ((dog > mx) & (dog > _CONTRAST)) | ((dog < mn) &
                                                 (dog < -_CONTRAST))
    # Edge ratio test on the 2x2 spatial Hessian.
    p = jnp.pad(dog, ((0, 0), (1, 1), (1, 1)), mode="edge")
    dxx = p[:, 1:-1, 2:] + p[:, 1:-1, :-2] - 2 * dog
    dyy = p[:, 2:, 1:-1] + p[:, :-2, 1:-1] - 2 * dog
    dxy = 0.25 * (p[:, 2:, 2:] + p[:, :-2, :-2] - p[:, 2:, :-2] -
                  p[:, :-2, 2:])
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_ok = (det > 0) & (tr * tr * _EDGE_R <
                           (_EDGE_R + 1) ** 2 * det)
    is_ext = is_ext & edge_ok
    return is_ext.at[0].set(False).at[-1].set(False)


def _grad(img: jnp.ndarray):
    p = jnp.pad(img, 1, mode="edge")
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    return gx, gy


@functools.partial(jax.jit, static_argnames=("radius",))
def _dominant_orientation(gx, gy, xy, radius: int):
    """36-bin histogram peak in a (2r+1)^2 window per keypoint."""
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    offs = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))
    wgt = jnp.asarray(np.exp(-(xs ** 2 + ys ** 2) /
                             (2 * (radius / 1.5) ** 2)).ravel().astype(
        np.float32))
    h, w = gx.shape
    pad = radius + 1
    gxp = jnp.pad(gx, pad)
    gyp = jnp.pad(gy, pad)
    pts = jnp.round(xy).astype(jnp.int32) + pad
    sy = pts[:, None, 1] + offs[None, :, 1]
    sx = pts[:, None, 0] + offs[None, :, 0]
    gxs = gxp[sy, sx]
    gys = gyp[sy, sx]
    mag = jnp.sqrt(gxs ** 2 + gys ** 2) * wgt[None]
    ang = jnp.arctan2(gys, gxs)                     # (-pi, pi]
    bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32)
    bins = jnp.clip(bins, 0, 35)
    hist = jax.vmap(lambda b, m: jnp.zeros(36).at[b].add(m))(bins, mag)
    peak = jnp.argmax(hist, axis=1)
    return (peak.astype(jnp.float32) + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi


@functools.partial(jax.jit, static_argnames=("width",))
def _sift_descriptor(gx, gy, xy, angle, width: int = 8):
    """4x4x8 descriptor from a (4*width)^2 rotated window."""
    half = 2 * width
    ys, xs = np.mgrid[-half:half, -half:half] + 0.5
    offs = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    offs_j = jnp.asarray(offs)
    n_samp = offs.shape[0]
    h, w = gx.shape
    pad = int(half * 1.5) + 2
    gxp = jnp.pad(gx, pad)
    gyp = jnp.pad(gy, pad)

    ca, sa = jnp.cos(angle), jnp.sin(angle)         # (K,)
    rx = ca[:, None] * offs_j[None, :, 0] - sa[:, None] * offs_j[None, :, 1]
    ry = sa[:, None] * offs_j[None, :, 0] + ca[:, None] * offs_j[None, :, 1]
    sxf = xy[:, 0:1] + rx
    syf = xy[:, 1:2] + ry
    sxi = jnp.round(sxf).astype(jnp.int32) + pad
    syi = jnp.round(syf).astype(jnp.int32) + pad
    gxs = gxp[syi, sxi]
    gys = gyp[syi, sxi]
    mag = jnp.sqrt(gxs ** 2 + gys ** 2)
    ang = jnp.arctan2(gys, gxs) - angle[:, None]
    obin = jnp.floor(jnp.mod(ang + 2 * jnp.pi, 2 * jnp.pi) /
                     (2 * jnp.pi) * 8).astype(jnp.int32)
    obin = jnp.clip(obin, 0, 7)
    # Spatial cell index per sample (static).
    cell_x = np.clip(((offs[:, 0] + half) // width).astype(np.int64), 0, 3)
    cell_y = np.clip(((offs[:, 1] + half) // width).astype(np.int64), 0, 3)
    cell = jnp.asarray(cell_y * 4 + cell_x, jnp.int32)     # (S,)
    flat_bin = cell[None, :] * 8 + obin                     # (K, S)

    def scatter(bins, mags):
        return jnp.zeros(128).at[bins].add(mags)
    desc = jax.vmap(scatter)(flat_bin, mag)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True),
                              1e-6)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True),
                              1e-6)
    return desc


@functools.partial(jax.jit,
                   static_argnames=("n_features", "n_octaves", "base_hw"))
def _sift_impl(gray, *, n_features: int, n_octaves: int,
               base_hw: Tuple[int, int]) -> Features:
    h, w = base_hw
    per_oct = [n_features // max(n_octaves, 1)] * n_octaves
    per_oct[0] += n_features - sum(per_oct)
    outs = []
    img = gray.astype(jnp.float32)
    for o in range(n_octaves):
        oh, ow = img.shape
        if min(oh, ow) < 32:
            per_oct[o] = 0
        if per_oct[o] > 0:
            gauss, dog = _dog_stack(img)
            ext = _extrema_mask(dog)
            resp = jnp.where(ext, jnp.abs(dog), 0.0)
            # Flatten (S, H, W) -> top-K.
            k_o = per_oct[o]
            vals, idx = jax.lax.top_k(resp.reshape(-1), k_o)
            valid = vals > 0
            sc = idx // (oh * ow)
            rem = idx % (oh * ow)
            ky = (rem // ow).astype(jnp.float32)
            kx = (rem % ow).astype(jnp.float32)
            xy = jnp.stack([kx, ky], -1)
            gx, gy = _grad(gauss[1])
            angle = _dominant_orientation(gx, gy, xy, 8)
            desc = _sift_descriptor(gx, gy, xy, angle)
            octave_scale = 2.0 ** o
            outs.append(Features(
                xy=xy * octave_scale,
                response=jnp.where(valid, vals, 0.0),
                angle=angle,
                octave=jnp.full((k_o,), o, jnp.int32),
                size=(_SIGMA0 * (2.0 ** (sc.astype(jnp.float32) / _N_SPO)) *
                      octave_scale * 2.0),
                desc=desc,
                valid=valid))
        img = resize(img, (max(oh // 2, 1), max(ow // 2, 1)))

    out = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)
    pad_n = n_features - out.xy.shape[0]
    if pad_n > 0:
        out = jax.tree.map(
            lambda x: jnp.pad(x, [(0, pad_n)] + [(0, 0)] * (x.ndim - 1)),
            out)
    return out


def sift_detect_and_describe(gray, n_features: int = 4000,
                             n_octaves: int = 4) -> Features:
    gray = jnp.asarray(gray)
    n_octaves = min(n_octaves,
                    max(1, int(np.log2(min(gray.shape[:2]) / 32)) + 1))
    return _sift_impl(gray, n_features=n_features, n_octaves=n_octaves,
                      base_hw=(gray.shape[0], gray.shape[1]))
