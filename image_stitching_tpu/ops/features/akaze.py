"""AKAZE-family detector/descriptor (nonlinear-diffusion scale space).

Covers the reference's ``AKAZE::create()`` alternative
(`image_stitching.cpp:547-550`).  Scale space evolves by explicit
Perona-Malik diffusion steps (FED-style, edge-preserving) instead of
Gaussian blurring; keypoints rank by determinant-of-Hessian across the
evolution; descriptors are M-LDB-style binary comparisons of mean
intensity / mean dx / mean dy over a rotated 3x3 grid of subcells
(binary, Hamming-matched like ORB).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..imgproc import gaussian_blur
from .hessian import det_hessian, diffusion_step, top_k_keypoints
from .types import Features

__all__ = ["akaze_detect_and_describe"]

_N_LAYERS = 4
_STEPS_PER_LAYER = 6


@functools.partial(jax.jit, static_argnames=("n_features", "base_hw"))
def _akaze_impl(gray, *, n_features: int, base_hw: Tuple[int, int]):
    img = gaussian_blur(gray.astype(jnp.float32), 1.0, 3)
    layers = [img]
    cur = img
    for _ in range(_N_LAYERS - 1):
        for _ in range(_STEPS_PER_LAYER):
            cur = diffusion_step(cur)
        layers.append(cur)
    maps = [det_hessian(l) * ((i + 1.0) ** 2)
            for i, l in enumerate(layers)]
    xy, resp, sc, valid = top_k_keypoints(maps, n_features, border=16)

    # Orientation from the evolved image's gradients (disk radius 6).
    sel = layers[1]
    p = jnp.pad(sel, 1, mode="edge")
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    ys, xs = np.mgrid[-6:7, -6:7]
    disk = xs ** 2 + ys ** 2 <= 36
    offs = jnp.asarray(np.stack([xs[disk], ys[disk]], -1))
    pad = 8
    gxp = jnp.pad(gx, pad)
    gyp = jnp.pad(gy, pad)
    pts = jnp.round(xy).astype(jnp.int32) + pad
    sy = pts[:, None, 1] + offs[None, :, 1]
    sx = pts[:, None, 0] + offs[None, :, 0]
    angle = jnp.arctan2(jnp.sum(gyp[sy, sx], 1), jnp.sum(gxp[sy, sx], 1))

    # M-LDB-ish binary descriptor: 3 channels (I, dx, dy) averaged over a
    # rotated GxG grid of subcells; all pairwise comparisons per channel.
    grid = 4
    cellr = 3  # subcell half-size in px
    centers = (np.mgrid[0:grid, 0:grid].reshape(2, -1).T -
               (grid - 1) / 2.0) * (2 * cellr + 1)
    centers = jnp.asarray(centers[:, ::-1].astype(np.float32))  # (C, 2) x,y
    sub_ys, sub_xs = np.mgrid[-cellr:cellr + 1, -cellr:cellr + 1]
    sub = jnp.asarray(np.stack([sub_xs.ravel(), sub_ys.ravel()], -1
                               ).astype(np.float32))
    pad2 = int(grid * (2 * cellr + 1)) + 4
    chans = [jnp.pad(sel, pad2), jnp.pad(gx, pad2), jnp.pad(gy, pad2)]

    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # Rotate cell centers per keypoint: (K, C, 2).
    cx = ca[:, None] * centers[None, :, 0] - sa[:, None] * centers[None, :, 1]
    cy = sa[:, None] * centers[None, :, 0] + ca[:, None] * centers[None, :, 1]
    sxi = jnp.round(xy[:, 0:1, None] + cx[:, :, None] +
                    sub[None, None, :, 0]).astype(jnp.int32) + pad2
    syi = jnp.round(xy[:, 1:2, None] + cy[:, :, None] +
                    sub[None, None, :, 1]).astype(jnp.int32) + pad2

    means = [c[syi, sxi].mean(axis=2) for c in chans]      # each (K, C)
    n_cells = grid * grid
    iu, ju = np.triu_indices(n_cells, k=1)
    bits = jnp.concatenate(
        [m[:, iu] > m[:, ju] for m in means], axis=1)       # (K, 3*C(C-1)/2)
    nbits = bits.shape[1]
    pad_bits = (-nbits) % 32
    bits = jnp.pad(bits, [(0, 0), (0, pad_bits)])
    k = bits.shape[0]
    words = bits.reshape(k, -1, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    desc = jnp.sum(words * weights, axis=-1, dtype=jnp.uint32)

    return Features(xy=xy, response=jnp.where(valid, resp, 0.0),
                    angle=angle, octave=sc,
                    size=(sc.astype(jnp.float32) + 1.0) * 8.0,
                    desc=desc, valid=valid)


def akaze_detect_and_describe(gray, n_features: int = 4000) -> Features:
    gray = jnp.asarray(gray)
    return _akaze_impl(gray, n_features=n_features,
                       base_hw=(gray.shape[0], gray.shape[1]))
