"""Blenders: NO / FEATHER / MULTI_BAND (Laplacian pyramid).

Replaces cv::detail::Blender::createDefault(MULTI_BAND) & friends as used at
`/root/reference/image_stitching/image_stitching.cpp:78-80, :1173-1193`
(band count = ceil(log2(blend_width)) - 1, blend_width =
sqrt(canvas_area) * blend_strength / 100, NO fallback when < 1) with
feed/blend at `:1218, :1225`.

TPU-native structure:
  * pyrDown/pyrUp use OpenCV's 5x5 [1 4 6 4 1] binomial kernel with
    reflect-101 borders, as fused jitted ops;
  * `MultiBandBlender.feed` builds the image's Laplacian pyramid and the
    mask's Gaussian weight pyramid on device and accumulates them into
    canvas-band accumulators at band-shifted offsets (the canvas is padded
    so its size is divisible by 2^bands, like the reference's prepare());
  * `blend` normalizes each band by its weight sum and collapses.

Per-image rects are expanded by 3*2^bands and snapped to the band grid
(OpenCV's feed gap logic) so pyramid context never leaks across images.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BlenderType
from .warps import result_roi

__all__ = ["pyr_down", "pyr_up", "make_blender", "MultiBandBlender",
           "FeatherBlender", "NoBlender", "num_bands_for"]

WEIGHT_EPS = 1e-5

_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _sep5(x: jnp.ndarray) -> jnp.ndarray:
    """5x5 binomial blur, reflect-101, channels-last HWC or HW."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    xp = jnp.pad(x, [(2, 2), (0, 0), (0, 0)], mode="reflect")
    x = sum(float(_K5[i]) * xp[i:i + x.shape[0]] for i in range(5))
    xp = jnp.pad(x, [(0, 0), (2, 2), (0, 0)], mode="reflect")
    x = sum(float(_K5[i]) * xp[:, i:i + x.shape[1]] for i in range(5))
    return x[..., 0] if squeeze else x


@jax.jit
def pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """cv::pyrDown: 5x5 blur then take even rows/cols."""
    return _sep5(x)[::2, ::2]


@functools.partial(jax.jit, static_argnames=("out_hw",))
def pyr_up(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv::pyrUp: zero-stuff 2x then blur with 4x the kernel."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    h, w, c = x.shape
    up = jnp.zeros((out_hw[0], out_hw[1], c), x.dtype)
    up = up.at[::2, ::2].set(x[:(out_hw[0] + 1) // 2, :(out_hw[1] + 1) // 2])
    out = _sep5(up) * 4.0
    return out[..., 0] if squeeze else out


def num_bands_for(canvas_roi, blend_strength: float) -> Tuple[int, float]:
    """(num_bands, blend_width) from `image_stitching.cpp:1176-1184`."""
    area = canvas_roi[2] * canvas_roi[3]
    blend_width = float(np.sqrt(area) * blend_strength / 100.0)
    if blend_width < 1.0:
        return 0, blend_width
    return max(int(np.ceil(np.log2(blend_width)) - 1.0), 0), blend_width


@functools.partial(jax.jit, static_argnames=("n_bands",))
def _laplace_pyramid(img: jnp.ndarray, n_bands: int):
    gauss = [img]
    for _ in range(n_bands):
        gauss.append(pyr_down(gauss[-1]))
    lap = []
    for b in range(n_bands):
        up = pyr_up(gauss[b + 1], gauss[b].shape[:2])
        lap.append(gauss[b] - up)
    lap.append(gauss[n_bands])
    return lap


@functools.partial(jax.jit, static_argnames=("n_bands",))
def _gauss_pyramid(img: jnp.ndarray, n_bands: int):
    out = [img]
    for _ in range(n_bands):
        out.append(pyr_down(out[-1]))
    return out


class MultiBandBlender:
    """cv::detail::MultiBandBlender semantics with device accumulators."""

    def __init__(self, corners, sizes, num_bands: int):
        x, y, w, h = result_roi(corners, sizes)
        self.final_roi = (x, y, w, h)
        step = 1 << num_bands
        wpad = -(-w // step) * step
        hpad = -(-h // step) * step
        self.roi = (x, y, wpad, hpad)
        self.num_bands = num_bands
        self.acc = []
        self.wacc = []
        for b in range(num_bands + 1):
            self.acc.append(jnp.zeros((hpad >> b, wpad >> b, 3), jnp.float32))
            self.wacc.append(jnp.zeros((hpad >> b, wpad >> b), jnp.float32))

    def feed(self, img, mask, corner):
        img = jnp.asarray(img, jnp.float32)
        mask = jnp.asarray(mask)
        h, w = img.shape[:2]
        gap = 3 * (1 << self.num_bands)
        step = 1 << self.num_bands
        rx, ry, rw, rh = self.roi
        tlx = max(rx, corner[0] - gap)
        tly = max(ry, corner[1] - gap)
        brx = min(rx + rw, corner[0] + w + gap)
        bry = min(ry + rh, corner[1] + h + gap)
        # Snap to the band grid so every pyramid level lands on integers.
        tlx = rx + (((tlx - rx) >> self.num_bands) << self.num_bands)
        tly = ry + (((tly - ry) >> self.num_bands) << self.num_bands)
        brx = rx + min(-(-(brx - rx) // step) * step, rw)
        bry = ry + min(-(-(bry - ry) // step) * step, rh)

        top = corner[1] - tly
        left = corner[0] - tlx
        bottom = bry - (corner[1] + h)
        right = brx - (corner[0] + w)
        img_p = jnp.pad(img, [(top, bottom), (left, right), (0, 0)],
                        mode="reflect")
        weight = (mask > 0).astype(jnp.float32)
        w_p = jnp.pad(weight, [(top, bottom), (left, right)],
                      mode="constant")

        lap = _laplace_pyramid(img_p, self.num_bands)
        wpyr = _gauss_pyramid(w_p, self.num_bands)
        ox, oy = tlx - rx, tly - ry
        for b in range(self.num_bands + 1):
            lx, ly = ox >> b, oy >> b
            lh, lw = lap[b].shape[:2]
            self.acc[b] = jax.lax.dynamic_update_slice(
                self.acc[b],
                jax.lax.dynamic_slice(self.acc[b], (ly, lx, 0),
                                      (lh, lw, 3)) +
                lap[b] * wpyr[b][..., None], (ly, lx, 0))
            self.wacc[b] = jax.lax.dynamic_update_slice(
                self.wacc[b],
                jax.lax.dynamic_slice(self.wacc[b], (ly, lx), (lh, lw)) +
                wpyr[b], (ly, lx))

    def blend(self):
        bands = [self.acc[b] / (self.wacc[b][..., None] + WEIGHT_EPS)
                 for b in range(self.num_bands + 1)]
        out = bands[-1]
        for b in range(self.num_bands - 1, -1, -1):
            out = pyr_up(out, bands[b].shape[:2]) + bands[b]
        mask = self.wacc[0] > WEIGHT_EPS
        fw, fh = self.final_roi[2], self.final_roi[3]
        return out[:fh, :fw], mask[:fh, :fw]


class FeatherBlender:
    """cv::detail::FeatherBlender: EDT-based weights, sharpness 1/width."""

    def __init__(self, corners, sizes, sharpness: float):
        x, y, w, h = result_roi(corners, sizes)
        self.roi = (x, y, w, h)
        self.sharpness = sharpness
        self.acc = jnp.zeros((h, w, 3), jnp.float32)
        self.wacc = jnp.zeros((h, w), jnp.float32)

    def feed(self, img, mask, corner):
        from .seams import edt_sq
        img = jnp.asarray(img, jnp.float32)
        m = (jnp.asarray(mask) > 0)
        # Distance to the nearest invalid pixel (inside counts up);
        # exact native O(HW) EDT when the host runtime is available.
        dist = jnp.sqrt(jnp.asarray(edt_sq(np.asarray(mask))))
        weight = jnp.clip(dist * self.sharpness, 0.0, 1.0) * m
        x, y = corner[0] - self.roi[0], corner[1] - self.roi[1]
        h, w = img.shape[:2]
        self.acc = jax.lax.dynamic_update_slice(
            self.acc, jax.lax.dynamic_slice(self.acc, (y, x, 0), (h, w, 3)) +
            img * weight[..., None], (y, x, 0))
        self.wacc = jax.lax.dynamic_update_slice(
            self.wacc, jax.lax.dynamic_slice(self.wacc, (y, x), (h, w)) +
            weight, (y, x))

    def blend(self):
        out = self.acc / (self.wacc[..., None] + WEIGHT_EPS)
        return out, self.wacc > WEIGHT_EPS


class NoBlender:
    """Blender::NO — plain overwrite where the mask is set."""

    def __init__(self, corners, sizes):
        x, y, w, h = result_roi(corners, sizes)
        self.roi = (x, y, w, h)
        self.canvas = jnp.zeros((h, w, 3), jnp.float32)
        self.mask = jnp.zeros((h, w), bool)

    def feed(self, img, mask, corner):
        img = jnp.asarray(img, jnp.float32)
        m = jnp.asarray(mask) > 0
        x, y = corner[0] - self.roi[0], corner[1] - self.roi[1]
        h, w = img.shape[:2]
        cur = jax.lax.dynamic_slice(self.canvas, (y, x, 0), (h, w, 3))
        self.canvas = jax.lax.dynamic_update_slice(
            self.canvas, jnp.where(m[..., None], img, cur), (y, x, 0))
        curm = jax.lax.dynamic_slice(self.mask, (y, x), (h, w))
        self.mask = jax.lax.dynamic_update_slice(self.mask, m | curm, (y, x))

    def blend(self):
        return self.canvas, self.mask


def make_blender(corners, sizes, blend_type: BlenderType,
                 blend_strength: float = 5.0):
    """Blender factory with the reference's fallback logic (`:1173-1192`)."""
    roi = result_roi(corners, sizes)
    n_bands, blend_width = num_bands_for(roi, blend_strength)
    if blend_width < 1.0 or blend_type == BlenderType.NO:
        return NoBlender(corners, sizes)
    if blend_type == BlenderType.MULTI_BAND:
        return MultiBandBlender(corners, sizes, n_bands)
    return FeatherBlender(corners, sizes, 1.0 / blend_width)
