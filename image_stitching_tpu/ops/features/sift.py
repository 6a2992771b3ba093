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
def _dominant_orientation(gx, gy, lvl, xy, radius: int):
    """36-bin histogram peak in a (2r+1)^2 window per keypoint.

    gx/gy: (L, H, W) gradient stacks of the gaussian levels; lvl (K,)
    selects each keypoint's own scale level (true SIFT samples the
    gaussian layer nearest the keypoint sigma, not a fixed one).  The
    histogram is circularly smoothed ([1,4,6,4,1]/16, the binomial
    OpenCV applies) and the peak is refined by parabolic interpolation.
    """
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    offs = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))
    wgt = jnp.asarray(np.exp(-(xs ** 2 + ys ** 2) /
                             (2 * (radius / 1.5) ** 2)).ravel().astype(
        np.float32))
    pad = radius + 1
    gxp = jnp.pad(gx, ((0, 0), (pad, pad), (pad, pad)))
    gyp = jnp.pad(gy, ((0, 0), (pad, pad), (pad, pad)))
    pts = jnp.round(xy).astype(jnp.int32) + pad
    sy = pts[:, None, 1] + offs[None, :, 1]
    sx = pts[:, None, 0] + offs[None, :, 0]
    sl = lvl[:, None].astype(jnp.int32)
    gxs = gxp[sl, sy, sx]
    gys = gyp[sl, sy, sx]
    mag = jnp.sqrt(gxs ** 2 + gys ** 2) * wgt[None]
    ang = jnp.arctan2(gys, gxs)                     # (-pi, pi]
    # Soft-assign each sample between its two nearest bins.
    fbin = (ang + jnp.pi) / (2 * jnp.pi) * 36.0 - 0.5
    b0 = jnp.floor(fbin).astype(jnp.int32)
    f = fbin - b0
    b0 = jnp.mod(b0, 36)
    b1 = jnp.mod(b0 + 1, 36)
    hist = jax.vmap(lambda i0, i1, ff, m: jnp.zeros(36)
                    .at[i0].add(m * (1 - ff)).at[i1].add(m * ff))(
        b0, b1, f, mag)
    kern = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    idx = (jnp.arange(36)[:, None] + jnp.arange(-2, 3)[None, :]) % 36
    hist = (hist[:, idx] * kern[None, None, :]).sum(-1)
    peak = jnp.argmax(hist, axis=1)
    hl = jnp.take_along_axis(hist, ((peak - 1) % 36)[:, None], 1)[:, 0]
    hc = jnp.take_along_axis(hist, peak[:, None], 1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % 36)[:, None], 1)[:, 0]
    denom = hl - 2 * hc + hr
    delta = jnp.where(jnp.abs(denom) > 1e-6,
                      0.5 * (hl - hr) / jnp.where(
                          jnp.abs(denom) > 1e-6, denom, 1.0), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    pk = peak.astype(jnp.float32) + delta
    return (pk + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi


@functools.partial(jax.jit, static_argnames=("width",))
def _sift_descriptor(gx, gy, lvl, xy, angle, width: int = 8):
    """4x4x8 descriptor from a (4*width)^2 rotated window.

    gx/gy: (L, H, W) per-level gradient stacks, indexed by each
    keypoint's scale level.  Orientation is soft-assigned between the
    two nearest of the 8 bins (hard spatial cells; the dominant
    quality lever vs the previous nearest-bin scatter)."""
    half = 2 * width
    ys, xs = np.mgrid[-half:half, -half:half] + 0.5
    offs = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    offs_j = jnp.asarray(offs)
    pad = int(half * 1.5) + 2
    gxp = jnp.pad(gx, ((0, 0), (pad, pad), (pad, pad)))
    gyp = jnp.pad(gy, ((0, 0), (pad, pad), (pad, pad)))

    ca, sa = jnp.cos(angle), jnp.sin(angle)         # (K,)
    rx = ca[:, None] * offs_j[None, :, 0] - sa[:, None] * offs_j[None, :, 1]
    ry = sa[:, None] * offs_j[None, :, 0] + ca[:, None] * offs_j[None, :, 1]
    sxf = xy[:, 0:1] + rx
    syf = xy[:, 1:2] + ry
    sxi = jnp.round(sxf).astype(jnp.int32) + pad
    syi = jnp.round(syf).astype(jnp.int32) + pad
    sl = lvl[:, None].astype(jnp.int32)
    gxs = gxp[sl, syi, sxi]
    gys = gyp[sl, syi, sxi]
    mag = jnp.sqrt(gxs ** 2 + gys ** 2)
    # Gaussian weighting over the window (sigma = half the window),
    # as in Lowe's descriptor.
    wgt = jnp.asarray(np.exp(-(offs[:, 0] ** 2 + offs[:, 1] ** 2) /
                             (2 * half * half)).astype(np.float32))
    mag = mag * wgt[None, :]
    ang = jnp.arctan2(gys, gxs) - angle[:, None]
    fob = jnp.mod(ang + 2 * jnp.pi, 2 * jnp.pi) / (2 * jnp.pi) * 8.0 - 0.5
    ob0 = jnp.floor(fob).astype(jnp.int32)
    of = fob - ob0
    ob0 = jnp.mod(ob0, 8)
    ob1 = jnp.mod(ob0 + 1, 8)
    # Spatial cell index per sample (static).
    cell_x = np.clip(((offs[:, 0] + half) // width).astype(np.int64), 0, 3)
    cell_y = np.clip(((offs[:, 1] + half) // width).astype(np.int64), 0, 3)
    cell = jnp.asarray(cell_y * 4 + cell_x, jnp.int32)     # (S,)
    bin0 = cell[None, :] * 8 + ob0                          # (K, S)
    bin1 = cell[None, :] * 8 + ob1

    def scatter(b0, b1, ff, mags):
        return (jnp.zeros(128).at[b0].add(mags * (1 - ff))
                .at[b1].add(mags * ff))
    desc = jax.vmap(scatter)(bin0, bin1, of, mag)
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
    # Every octave gets the FULL keypoint budget as candidate slots and a
    # global top-K (by |DoG| response) selects across octaves afterwards.
    # Fixed per-octave quotas left empty slots whenever one octave was
    # starved while another overflowed — measured 284/500 keypoints on
    # the synthetic captures (NOTES_r02).
    per_oct = [n_features] * n_octaves
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
            kyi = rem // ow
            kxi = rem % ow
            # Sub-pixel/scale extremum refinement: quadratic fit of the
            # DoG 3x3x3 neighborhood (Brown & Lowe), offset = -H^-1 g
            # clipped to +-0.5 — localization error drives RANSAC inlier
            # ratio directly.
            dp = jnp.pad(dog, ((1, 1), (1, 1), (1, 1)), mode="edge")

            def nb(ds, dy, dx):
                return dp[sc + 1 + ds, kyi + 1 + dy, kxi + 1 + dx]
            g1 = 0.5 * (nb(0, 0, 1) - nb(0, 0, -1))       # d/dx
            g2 = 0.5 * (nb(0, 1, 0) - nb(0, -1, 0))       # d/dy
            g3 = 0.5 * (nb(1, 0, 0) - nb(-1, 0, 0))       # d/ds
            c = nb(0, 0, 0)
            hxx = nb(0, 0, 1) + nb(0, 0, -1) - 2 * c
            hyy = nb(0, 1, 0) + nb(0, -1, 0) - 2 * c
            hss = nb(1, 0, 0) + nb(-1, 0, 0) - 2 * c
            hxy = 0.25 * (nb(0, 1, 1) + nb(0, -1, -1) -
                          nb(0, 1, -1) - nb(0, -1, 1))
            hxs = 0.25 * (nb(1, 0, 1) + nb(-1, 0, -1) -
                          nb(1, 0, -1) - nb(-1, 0, 1))
            hys = 0.25 * (nb(1, 1, 0) + nb(-1, -1, 0) -
                          nb(1, -1, 0) - nb(-1, 1, 0))
            hmat = jnp.stack([
                jnp.stack([hxx, hxy, hxs], -1),
                jnp.stack([hxy, hyy, hys], -1),
                jnp.stack([hxs, hys, hss], -1)], -2)       # (K, 3, 3)
            gvec = jnp.stack([g1, g2, g3], -1)             # (K, 3)
            eye = jnp.eye(3, dtype=hmat.dtype) * 1e-4
            off3 = -jnp.linalg.solve(hmat + eye, gvec[..., None])[..., 0]
            off3 = jnp.where(jnp.isfinite(off3), off3, 0.0)
            off3 = jnp.clip(off3, -0.5, 0.5)
            ky = jnp.clip(kyi.astype(jnp.float32) + off3[:, 1],
                          0.0, oh - 1.0)
            kx = jnp.clip(kxi.astype(jnp.float32) + off3[:, 0],
                          0.0, ow - 1.0)
            xy = jnp.stack([kx, ky], -1)
            # Per-level gradients: the orientation/descriptor sample the
            # gaussian layer of each keypoint's own DoG scale (true SIFT
            # semantics; a fixed gauss[1] blurred away fine structure for
            # upper scales).  Extrema live on inner scales 1.._N_SPO.
            gstack = [_grad(gauss[s]) for s in range(1, _N_SPO + 1)]
            gx = jnp.stack([g[0] for g in gstack])
            gy = jnp.stack([g[1] for g in gstack])
            lvl = jnp.clip(sc, 1, _N_SPO) - 1
            angle = _dominant_orientation(gx, gy, lvl, xy, 8)
            desc = _sift_descriptor(gx, gy, lvl, xy, angle)
            octave_scale = 2.0 ** o
            outs.append(Features(
                xy=xy * octave_scale,
                response=jnp.where(valid, vals, 0.0),
                angle=angle,
                octave=jnp.full((k_o,), o, jnp.int32),
                size=(_SIGMA0 * (2.0 ** ((sc.astype(jnp.float32) +
                                          off3[:, 2]) / _N_SPO)) *
                      octave_scale * 2.0),
                desc=desc,
                valid=valid))
        img = resize(img, (max(oh // 2, 1), max(ow // 2, 1)))

    out = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)
    if out.xy.shape[0] > n_features:
        # Global selection across octaves (invalid slots rank last).
        sel_resp = jnp.where(out.valid, out.response, -1.0)
        _, sel = jax.lax.top_k(sel_resp, n_features)
        out = jax.tree.map(lambda x: x[sel], out)
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
