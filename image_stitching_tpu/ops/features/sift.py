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


def _dog_stack(img: jnp.ndarray, sigma_prev: float = 0.5):
    """One octave: blurred stack (s+3) and DoG stack (s+2).

    sigma_prev: assumed blur of the input (0.5 for a camera image; 1.0
    for the 2x-upsampled base octave, cv2's firstOctave=-1)."""
    k = 2.0 ** (1.0 / _N_SPO)
    gauss = []
    cur = img
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


_ORI_RADIUS = 15      # static grid radius; covers cv2's round(4.5*scl)
                      # for every level (scl <= sigma0*2 = 3.2 -> 14.4)


@functools.partial(jax.jit, static_argnames=("radius",))
def _dominant_orientation(gx, gy, lvl, xy, scl, radius: int = _ORI_RADIUS):
    """36-bin histogram peak, cv2 calcOrientationHist semantics.

    gx/gy: (L, H, W) gradient stacks of the gaussian levels; lvl (K,)
    selects each keypoint's own scale level (true SIFT samples the
    gaussian layer nearest the keypoint sigma, not a fixed one).  The
    window is SCALE-ADAPTIVE per keypoint: square radius
    round(4.5 * scl_octv) with Gaussian weight sigma = 1.5 * scl_octv
    (a fixed radius-8 window truncated top-octave levels ~2x and washed
    small scales with a too-wide Gaussian).  The static (2R+1)^2 grid is
    masked per keypoint, so shapes stay static.  The histogram is
    circularly smoothed ([1,4,6,4,1]/16, the binomial OpenCV applies)
    and each peak is refined by parabolic interpolation.
    """
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    offs = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1))
    r2 = jnp.asarray((xs ** 2 + ys ** 2).ravel().astype(np.float32))
    cheb = jnp.asarray(np.maximum(np.abs(xs), np.abs(ys)).ravel()
                       .astype(np.float32))
    pad = radius + 1
    gxp = jnp.pad(gx, ((0, 0), (pad, pad), (pad, pad)))
    gyp = jnp.pad(gy, ((0, 0), (pad, pad), (pad, pad)))
    pts = jnp.round(xy).astype(jnp.int32) + pad
    sy = pts[:, None, 1] + offs[None, :, 1]
    sx = pts[:, None, 0] + offs[None, :, 0]
    sl = lvl[:, None].astype(jnp.int32)
    gxs = gxp[sl, sy, sx]
    gys = gyp[sl, sy, sx]
    sig = 1.5 * scl[:, None]                               # (K, 1)
    rad_k = jnp.round(3.0 * sig)                           # cv2 radius
    wgt = jnp.exp(-r2[None, :] / (2.0 * sig * sig)) * \
        (cheb[None, :] <= rad_k)
    mag = jnp.sqrt(gxs ** 2 + gys ** 2) * wgt
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

    def refine(peak):
        hl = jnp.take_along_axis(hist, ((peak - 1) % 36)[:, None], 1)[:, 0]
        hc = jnp.take_along_axis(hist, peak[:, None], 1)[:, 0]
        hr = jnp.take_along_axis(hist, ((peak + 1) % 36)[:, None], 1)[:, 0]
        denom = hl - 2 * hc + hr
        delta = jnp.where(jnp.abs(denom) > 1e-6,
                          0.5 * (hl - hr) / jnp.where(
                              jnp.abs(denom) > 1e-6, denom, 1.0), 0.0)
        pk = peak.astype(jnp.float32) + jnp.clip(delta, -0.5, 0.5)
        return (pk + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi

    peak = jnp.argmax(hist, axis=1)
    # Second orientation (cv2 duplicates a keypoint for every local
    # histogram max >= 0.8 * peak — we keep the strongest second one):
    # a circular local max, not adjacent to the primary peak.
    left = jnp.roll(hist, 1, axis=1)
    right = jnp.roll(hist, -1, axis=1)
    localmax = (hist > left) & (hist >= right)
    bins = jnp.arange(36)[None, :]
    dist = jnp.abs((bins - peak[:, None] + 18) % 36 - 18)
    cand = jnp.where(localmax & (dist > 1), hist, -1.0)
    peak2 = jnp.argmax(cand, axis=1)
    val1 = jnp.take_along_axis(hist, peak[:, None], 1)[:, 0]
    val2 = jnp.take_along_axis(cand, peak2[:, None], 1)[:, 0]
    has2 = val2 >= 0.8 * val1
    return refine(peak), refine(peak2), has2


_GRID = 8             # samples per cell axis (grid = 4*_GRID x 4*_GRID);
                      # sample spacing = hist_width/8 in (0.6, 1.2) px —
                      # the same density as cv2's per-pixel iteration
_SCL_FCTR = 3.0       # cv2 SIFT_DESCR_SCL_FCTR: hist_width = 3 * scl_octv


def _descr_grid():
    """Static rotated-frame sampling grid in CELL units, with its soft
    spatial-binning matrix.  Returns (offs_units (S, 2) float32,
    cell_w (S, 16) float32): sample s contributes cell_w[s, c] of its
    (orientation-binned) magnitude to spatial cell c — Lowe's bilinear
    spatial interpolation, static because the grid is fixed in cell
    units (the per-keypoint scale only stretches the PIXEL positions).
    Includes the descriptor Gaussian (sigma = 2 cells = half window)."""
    n = 4 * _GRID
    ys, xs = (np.mgrid[0:n, 0:n] + 0.5) / _GRID - 2.0   # cells in (-2, 2)
    offs = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    gauss = np.exp(-(offs[:, 0] ** 2 + offs[:, 1] ** 2) /
                   (2 * 2.0 * 2.0)).astype(np.float32)
    cbin = offs[:, 0] + 1.5      # continuous cell coords, centers 0..3
    rbin = offs[:, 1] + 1.5
    c0 = np.floor(cbin).astype(np.int64)
    r0 = np.floor(rbin).astype(np.int64)
    fc = (cbin - c0).astype(np.float32)
    fr = (rbin - r0).astype(np.float32)
    s = offs.shape[0]
    cell_w = np.zeros((s, 16), np.float32)
    for dr, dc in ((0, 0), (0, 1), (1, 0), (1, 1)):
        rr = r0 + dr
        cc = c0 + dc
        wgt = (np.where(dr, fr, 1 - fr) * np.where(dc, fc, 1 - fc) *
               gauss)
        ok = (rr >= 0) & (rr < 4) & (cc >= 0) & (cc < 4)
        idx = np.clip(rr, 0, 3) * 4 + np.clip(cc, 0, 3)
        np.add.at(cell_w, (np.arange(s), idx), np.where(ok, wgt, 0.0))
    return jnp.asarray(offs), jnp.asarray(cell_w)


@jax.jit
def _sift_descriptor(gx, gy, lvl, xy, angle, scl):
    """4x4x8 descriptor, Lowe/OpenCV semantics (calcSIFTDescriptor,
    the reference's SIFT alternative `image_stitching.cpp:557-560`):

    * scale-adaptive window: hist_width = 3 * scl_octv per keypoint
      (cv2's SIFT_DESCR_SCL_FCTR), so the descriptor measures the same
      physical neighborhood regardless of the keypoint's sigma — a fixed
      window over/under-sampled off-center scales;
    * gradients bilinearly sampled at the fractional rotated positions
      (nearest-pixel rounding aliased the rotated grid);
    * trilinear soft binning: bilinear in the spatial cells (a static
      matrix — the grid is fixed in cell units) x linear in orientation.
    The spatial contraction is one (S, 16) matmul, not a scatter.
    """
    offs_units, cell_w = _descr_grid()                   # (S, 2), (S, 16)
    pad = 32           # max pixel radius: 2 cells * hist_width<=9.6 * 1.5
    gxp = jnp.pad(gx, ((0, 0), (pad, pad), (pad, pad)))
    gyp = jnp.pad(gy, ((0, 0), (pad, pad), (pad, pad)))

    hist_width = jnp.clip(_SCL_FCTR * scl, 1.0, 9.6)[:, None]   # (K, 1)
    ca, sa = jnp.cos(angle), jnp.sin(angle)              # (K,)
    px = offs_units[None, :, 0] * hist_width             # pixel offsets
    py = offs_units[None, :, 1] * hist_width
    rx = ca[:, None] * px - sa[:, None] * py
    ry = sa[:, None] * px + ca[:, None] * py
    sxf = xy[:, 0:1] + rx + pad
    syf = xy[:, 1:2] + ry + pad
    x0 = jnp.floor(sxf)
    y0 = jnp.floor(syf)
    fx = sxf - x0
    fy = syf - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sl = lvl[:, None].astype(jnp.int32)

    def samp(p):
        p00 = p[sl, y0i, x0i]
        p01 = p[sl, y0i, x0i + 1]
        p10 = p[sl, y0i + 1, x0i]
        p11 = p[sl, y0i + 1, x0i + 1]
        return (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy) +
                p10 * (1 - fx) * fy + p11 * fx * fy)
    gxs = samp(gxp)
    gys = samp(gyp)
    mag = jnp.sqrt(gxs ** 2 + gys ** 2)                  # (K, S)
    ang = jnp.arctan2(gys, gxs) - angle[:, None]
    fob = jnp.mod(ang + 2 * jnp.pi, 2 * jnp.pi) / (2 * jnp.pi) * 8.0 - 0.5
    ob0 = jnp.floor(fob)
    of = fob - ob0
    ob0i = jnp.mod(ob0.astype(jnp.int32), 8)
    # Dense orientation weights (K, S, 8): two taps per sample.
    oh0 = jax.nn.one_hot(ob0i, 8, dtype=jnp.float32)
    oh1 = jax.nn.one_hot(jnp.mod(ob0i + 1, 8), 8, dtype=jnp.float32)
    mo = mag[..., None] * (oh0 * (1 - of[..., None]) +
                           oh1 * of[..., None])          # (K, S, 8)
    desc = jnp.einsum("sc,kso->kco", cell_w, mo).reshape(-1, 128)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True),
                              1e-6)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True),
                              1e-6)
    return desc


@functools.partial(jax.jit,
                   static_argnames=("n_features", "n_octaves", "base_hw",
                                    "upsample"))
def _sift_impl(gray, *, n_features: int, n_octaves: int,
               base_hw: Tuple[int, int], upsample: bool = True) -> Features:
    h, w = base_hw
    # Every octave gets the FULL keypoint budget as candidate slots and a
    # global top-K (by |DoG| response) selects across octaves afterwards.
    # Fixed per-octave quotas left empty slots whenever one octave was
    # starved while another overflowed — measured 284/500 keypoints on
    # the synthetic captures (NOTES_r02).
    per_oct = [n_features] * n_octaves
    outs = []
    img = gray.astype(jnp.float32)
    if upsample:
        # cv2 SIFT's firstOctave = -1: the base octave runs on the
        # 2x-upsampled image (assumed blur 0.5 doubles to 1.0) — finer
        # gradients make the descriptors measurably more discriminative.
        img = resize(img, (2 * h, 2 * w))
    for o in range(n_octaves):
        oh, ow = img.shape
        if min(oh, ow) < 32:
            per_oct[o] = 0
        if per_oct[o] > 0:
            # Octave 0 input: camera blur 0.5 (doubled to 1.0 by the 2x
            # upsample).  Later octaves chain from the decimated
            # gauss[_N_SPO] (sigma 2*sigma0 -> sigma0 after 2x down),
            # cv2's buildGaussianPyramid — decimating the RAW image
            # aliased the upper octaves.
            sp = ((1.0 if upsample else 0.5) if o == 0 else _SIGMA0)
            gauss, dog = _dog_stack(img, sigma_prev=sp)
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
            # Per-keypoint scale inside the octave (cv2's scl_octv =
            # kpt.size * 0.5 / (1 << octave)): drives the orientation
            # and descriptor scale-adaptive windows.
            scl = _SIGMA0 * (2.0 ** ((sc.astype(jnp.float32) +
                                      off3[:, 2]) / _N_SPO))
            angle, angle2, has2 = _dominant_orientation(gx, gy, lvl, xy,
                                                        scl)
            # Multi-orientation duplication (cv2 emits one keypoint per
            # histogram peak >= 0.8 * max): the second-peak copies join
            # the candidate pool and compete in the global top-K, ranked
            # infinitesimally below their primaries.
            xy = jnp.concatenate([xy, xy])
            lvl = jnp.concatenate([lvl, lvl])
            scl = jnp.concatenate([scl, scl])
            angle = jnp.concatenate([angle, angle2])
            valid = jnp.concatenate([valid, valid & has2])
            vals = jnp.concatenate([vals, vals * (1.0 - 1e-6)])
            sc = jnp.concatenate([sc, sc])
            off3 = jnp.concatenate([off3, off3])
            k_o = 2 * k_o
            desc = _sift_descriptor(gx, gy, lvl, xy, angle, scl)
            # Coordinates map back to ORIGINAL pixels (the upsampled
            # base octave lives at 2x).
            octave_scale = 2.0 ** o * (0.5 if upsample else 1.0)
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
            img = gauss[_N_SPO]      # chain the blurred pyramid (cv2)
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
                             n_octaves: int = 4,
                             upsample: bool = False) -> Features:
    gray = jnp.asarray(gray)
    base_min = min(gray.shape[:2]) * (2 if upsample else 1)
    n_octaves = min(n_octaves + (1 if upsample else 0),
                    max(1, int(np.log2(base_min / 32)) + 1))
    return _sift_impl(gray, n_features=n_features, n_octaves=n_octaves,
                      base_hw=(gray.shape[0], gray.shape[1]),
                      upsample=upsample)
