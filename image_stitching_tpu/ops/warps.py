"""Rotation warpers: every projection family the reference can select.

Replaces the cv::detail RotationWarpers chosen at
`/root/reference/image_stitching/image_stitching.cpp:919-965` (spherical
default plus plane/affine/cylindrical/fisheye/stereographic/
compressedPlane{A2B1,A1.5B1}{,Portrait}/panini{A2B1,A1.5B1}{,Portrait}/
mercator/transverseMercator, and the CUDA variants at `:920-929` whose role
the TPU path plays by default).

Design (TPU-first, not a port):
  * Each projection is a pair of pure functions on ray bundles:
      forward:  unit rays ``(..., 3)`` -> plane coords ``(u, v)``
      backward: plane coords -> unit rays
    composed with the camera model ray = R @ K^-1 @ pixel (forward) and
    pixel = K @ R^T @ ray (backward) — the same factorization OpenCV's
    ProjectorBase uses (r_kinv / k_rinv).
  * `warp` computes the dest ROI host-side (tiny border math), then runs a
    single fused XLA computation: dest grid -> backward map -> bilinear
    gather with BORDER_REFLECT (image) or nearest/BORDER_CONSTANT (mask),
    matching the interp/border choices at `image_stitching.cpp:985-988`.
  * Everything is batched: pass ``(N, H, W, C)`` stacks and ``(N, 3, 3)``
    K/R to `warp_batch` and the whole loop at `:975-989` becomes one vmap.

Coordinates: x right, y down, z forward (OpenCV convention).  Azimuth
u_ = atan2(x, z); the spherical polar angle matches OpenCV's
``v_ = pi - acos(y / |r|)`` so ROI offsets agree with the reference.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Warper", "make_warper", "PROJECTIONS", "result_roi",
           "result_roi_intersection"]

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Projection formulas.  forward: (x, y, z) rays -> (u, v); backward: inverse.
# Each returns coords in "unit scale"; the warper multiplies by scale.
# ---------------------------------------------------------------------------

def _make_projections(xp) -> "Dict[str, Tuple[Callable, Callable]]":
    """Build the projection table against a numpy-like namespace.

    Instantiated twice: with jnp (device kernels) and with numpy (host-side
    ROI detection — the axon TPU tunnel has ~25ms latency per device->host
    sync, so ROI math must never touch the device).
    """
    def _sph_angles(x, y, z):
        """(azimuth u_, polar v_) with v_ = pi - acos(y/r) in [0, pi]."""
        u_ = xp.arctan2(x, z)
        r = xp.sqrt(x * x + y * y + z * z)
        w = xp.clip(y / xp.maximum(r, 1e-30), -1.0, 1.0)
        v_ = xp.pi - xp.arccos(w)
        return u_, v_


    def _elev_angles(x, y, z):
        """(azimuth u_, elevation v_) with v_ = asin(y/r) in [-pi/2, pi/2]."""
        u_ = xp.arctan2(x, z)
        r = xp.sqrt(x * x + y * y + z * z)
        v_ = xp.arcsin(xp.clip(y / xp.maximum(r, 1e-30), -1.0, 1.0))
        return u_, v_


    def _ray_from_elev(u_, v_):
        cv = xp.cos(v_)
        return cv * xp.sin(u_), xp.sin(v_), cv * xp.cos(u_)


    def _plane_fwd(x, y, z):
        zs = xp.where(xp.abs(z) < 1e-12, 1e-12, z)
        return x / zs, y / zs


    def _plane_bwd(u, v):
        return u, v, xp.ones_like(u)


    def _spherical_fwd(x, y, z):
        u_, v_ = _sph_angles(x, y, z)
        return u_, v_


    def _spherical_bwd(u, v):
        sinv = xp.sin(xp.pi - v)
        return sinv * xp.sin(u), xp.cos(xp.pi - v), sinv * xp.cos(u)


    def _cylindrical_fwd(x, y, z):
        u_ = xp.arctan2(x, z)
        v_ = y / xp.maximum(xp.sqrt(x * x + z * z), 1e-30)
        return u_, v_


    def _cylindrical_bwd(u, v):
        return xp.sin(u), v, xp.cos(u)


    def _fisheye_fwd(x, y, z):
        u_, v_ = _sph_angles(x, y, z)
        return v_ * xp.cos(u_), v_ * xp.sin(u_)


    def _fisheye_bwd(u, v):
        v_ = xp.sqrt(u * u + v * v)
        u_ = xp.arctan2(v, u)
        sinv = xp.sin(xp.pi - v_)
        return sinv * xp.sin(u_), xp.cos(xp.pi - v_), sinv * xp.cos(u_)


    def _stereographic_fwd(x, y, z):
        u_, v_ = _sph_angles(x, y, z)
        # r = sin(v_) / (1 - cos(v_)) = cot(v_/2): projection from the pole.
        r = xp.sin(v_) / xp.maximum(1.0 - xp.cos(v_), 1e-30)
        return r * xp.cos(u_), r * xp.sin(u_)


    def _stereographic_bwd(u, v):
        r = xp.sqrt(u * u + v * v)
        u_ = xp.arctan2(v, u)
        v_ = 2.0 * xp.arctan2(xp.ones_like(r), r)  # = 2*atan(1/r); r=0 -> pi
        sinv = xp.sin(xp.pi - v_)
        return sinv * xp.sin(u_), xp.cos(xp.pi - v_), sinv * xp.cos(u_)


    def _compressed_fwd(a: float, b: float):
        def fwd(x, y, z):
            u_, v_ = _elev_angles(x, y, z)
            u = a * xp.tan(u_ / a)
            v = b * xp.tan(v_) / xp.cos(u_)
            return u, v
        return fwd


    def _compressed_bwd(a: float, b: float):
        def bwd(u, v):
            u_ = a * xp.arctan(u / a)
            v_ = xp.arctan(v * xp.cos(u_) / b)
            return _ray_from_elev(u_, v_)
        return bwd


    def _portrait(fwd_factory, bwd_factory):
        """Portrait variant: the compression axis is vertical.  OpenCV computes
        the inner projection on the axis-swapped ray (y, x, z) and negates u
        (verified numerically against cv2.PyRotationWarper)."""
        def make_fwd(a, b):
            inner = fwd_factory(a, b)

            def fwd(x, y, z):
                u, v = inner(y, x, z)
                return -u, v
            return fwd

        def make_bwd(a, b):
            inner = bwd_factory(a, b)

            def bwd(u, v):
                x, y, z = inner(-u, v)
                return y, x, z
            return bwd
        return make_fwd, make_bwd


    _compressed_portrait_fwd, _compressed_portrait_bwd = _portrait(
        _compressed_fwd, _compressed_bwd)


    def _panini_fwd(a: float, b: float):
        def fwd(x, y, z):
            u_, v_ = _elev_angles(x, y, z)
            tg = a * xp.tan(u_ / a)
            sinu = xp.sin(u_)
            ratio = xp.where(xp.abs(sinu) < 1e-7, xp.ones_like(sinu),
                              tg / xp.where(xp.abs(sinu) < 1e-7, 1.0, sinu))
            return tg, b * xp.tan(v_) * ratio
        return fwd


    def _panini_bwd(a: float, b: float):
        def bwd(u, v):
            u_ = a * xp.arctan(u / a)
            tg = a * xp.tan(u_ / a)
            sinu = xp.sin(u_)
            ratio = xp.where(xp.abs(sinu) < 1e-7, xp.ones_like(sinu),
                              tg / xp.where(xp.abs(sinu) < 1e-7, 1.0, sinu))
            v_ = xp.arctan(v / (b * ratio))
            return _ray_from_elev(u_, v_)
        return bwd


    _panini_portrait_fwd, _panini_portrait_bwd = _portrait(_panini_fwd,
                                                           _panini_bwd)


    def _mercator_fwd(x, y, z):
        u_, v_ = _elev_angles(x, y, z)
        v_ = xp.clip(v_, -1.5, 1.5)
        return u_, xp.log(xp.tan(xp.pi / 4.0 + v_ / 2.0))


    def _mercator_bwd(u, v):
        v_ = 2.0 * xp.arctan(xp.exp(v)) - xp.pi / 2.0
        return _ray_from_elev(u, v_)


    def _transverse_mercator_fwd(x, y, z):
        u_, v_ = _elev_angles(x, y, z)
        bb = xp.clip(xp.cos(v_) * xp.sin(u_), -0.999999, 0.999999)
        u = 0.5 * xp.log((1.0 + bb) / (1.0 - bb))
        v = xp.arctan2(xp.tan(v_), xp.cos(u_))
        return u, v


    def _transverse_mercator_bwd(u, v):
        v_ = xp.arcsin(xp.clip(xp.sin(v) / xp.cosh(u), -1.0, 1.0))
        u_ = xp.arctan2(xp.sinh(u), xp.cos(v))
        return _ray_from_elev(u_, v_)



    return {
        "plane": (_plane_fwd, _plane_bwd),
        "affine": (_plane_fwd, _plane_bwd),  # affine folded into R + offset
        "spherical": (_spherical_fwd, _spherical_bwd),
        "cylindrical": (_cylindrical_fwd, _cylindrical_bwd),
        "fisheye": (_fisheye_fwd, _fisheye_bwd),
        "stereographic": (_stereographic_fwd, _stereographic_bwd),
        "compressedPlaneA2B1": (_compressed_fwd(2.0, 1.0),
                                _compressed_bwd(2.0, 1.0)),
        "compressedPlaneA1.5B1": (_compressed_fwd(1.5, 1.0),
                                  _compressed_bwd(1.5, 1.0)),
        "compressedPlanePortraitA2B1": (_compressed_portrait_fwd(2.0, 1.0),
                                        _compressed_portrait_bwd(2.0, 1.0)),
        "compressedPlanePortraitA1.5B1": (
            _compressed_portrait_fwd(1.5, 1.0),
            _compressed_portrait_bwd(1.5, 1.0)),
        "paniniA2B1": (_panini_fwd(2.0, 1.0), _panini_bwd(2.0, 1.0)),
        "paniniA1.5B1": (_panini_fwd(1.5, 1.0), _panini_bwd(1.5, 1.0)),
        "paniniPortraitA2B1": (_panini_portrait_fwd(2.0, 1.0),
                               _panini_portrait_bwd(2.0, 1.0)),
        "paniniPortraitA1.5B1": (_panini_portrait_fwd(1.5, 1.0),
                                 _panini_portrait_bwd(1.5, 1.0)),
        "mercator": (_mercator_fwd, _mercator_bwd),
        "transverseMercator": (_transverse_mercator_fwd,
                               _transverse_mercator_bwd),
    }


PROJECTIONS = _make_projections(jnp)
PROJECTIONS_NP = _make_projections(np)





# ---------------------------------------------------------------------------
# Warper
# ---------------------------------------------------------------------------

def _forward_uv(proj_fwd, points_xy: Array, k: Array, r: Array,
                scale: float) -> Tuple[Array, Array]:
    """Pixel coords (..., 2) -> warped-plane coords, via ray = R K^-1 p."""
    k = jnp.asarray(k, jnp.float32)
    r = jnp.asarray(r, jnp.float32)
    r_kinv = r @ jnp.linalg.inv(k)
    ones = jnp.ones_like(points_xy[..., :1])
    p = jnp.concatenate([points_xy, ones], axis=-1)
    ray = p @ r_kinv.T
    u, v = proj_fwd(ray[..., 0], ray[..., 1], ray[..., 2])
    return u * scale, v * scale


def _forward_uv_np(proj_name: str, points_xy: np.ndarray, k, r,
                   scale: float):
    """Host-side forward map for ROI detection/warp_point: float32 numpy,
    zero device traffic (the axon tunnel costs ~25ms per download)."""
    fwd = PROJECTIONS_NP[proj_name][0]
    k = np.asarray(k, np.float32)
    r = np.asarray(r, np.float32)
    r_kinv = (r @ np.linalg.inv(k)).astype(np.float32)
    pts = np.asarray(points_xy, np.float32)
    p = np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)
    ray = p @ r_kinv.T
    u, v = fwd(ray[..., 0], ray[..., 1], ray[..., 2])
    return u * np.float32(scale), v * np.float32(scale)


def _backward_xy(proj_bwd, u: Array, v: Array, k: Array, r: Array,
                 scale: float) -> Tuple[Array, Array, Array]:
    """Warped coords -> source pixel coords + validity (z > 0)."""
    k = jnp.asarray(k, jnp.float32)
    r = jnp.asarray(r, jnp.float32)
    k_rinv = k @ r.T
    x_, y_, z_ = proj_bwd(u / scale, v / scale)
    px = k_rinv[0, 0] * x_ + k_rinv[0, 1] * y_ + k_rinv[0, 2] * z_
    py = k_rinv[1, 0] * x_ + k_rinv[1, 1] * y_ + k_rinv[1, 2] * z_
    pz = k_rinv[2, 0] * x_ + k_rinv[2, 1] * y_ + k_rinv[2, 2] * z_
    valid = pz > 0
    zs = jnp.where(jnp.abs(pz) < 1e-12, 1e-12, pz)
    # Invalid rays map to -1 like OpenCV's mapBackward, landing outside.
    return (jnp.where(valid, px / zs, -1.0),
            jnp.where(valid, py / zs, -1.0), valid)


# Separable backward ray maps: for axis-aligned warped grids the ray
# direction factors into functions of u alone and v alone, so the
# transcendentals are O(W + H) 1-D ops instead of O(W*H) per-pixel ones
# — the compose scan was backward-warp-math bound at gigapixel scale
# (~6.6 GP of per-pixel sin/atan for a 271 MP canvas, NOTES_r05).
# sin(broadcast(x)) == broadcast(sin(x)) elementwise, and the factor
# product is the same f32 multiply the 2-D form executes, so sample
# coordinates are BITWISE identical to the meshgrid path (the golden
# cv2 warp tests hold unchanged).  Rank-1 factors are returned
# broadcast-ready; `_backward_xy`'s projection tail broadcasts them.
def _sph_bwd_sep(u, v):
    sinv = jnp.sin(jnp.pi - v)[:, None]
    return (sinv * jnp.sin(u)[None, :],
            jnp.cos(jnp.pi - v)[:, None],
            sinv * jnp.cos(u)[None, :])


def _cyl_bwd_sep(u, v):
    return jnp.sin(u)[None, :], v[:, None], jnp.cos(u)[None, :]


def _plane_bwd_sep(u, v):
    return u[None, :], v[:, None], jnp.ones((v.shape[0], 1), jnp.float32)


SEPARABLE_BWD = {"plane": _plane_bwd_sep, "spherical": _sph_bwd_sep,
                 "cylindrical": _cyl_bwd_sep}


def backward_xy_1d(proj_name: str, us: Array, vs: Array, k: Array,
                   r: Array, scale) -> Tuple[Array, Array, Array]:
    """`_backward_xy` over the grid us x vs (1-D coords), using the
    separable ray factorization when the projection has one."""
    sep = SEPARABLE_BWD.get(proj_name)
    if sep is None:
        uu, vv = jnp.meshgrid(us, vs)
        return _backward_xy(PROJECTIONS[proj_name][1], uu, vv, k, r,
                            scale)
    k = jnp.asarray(k, jnp.float32)
    r = jnp.asarray(r, jnp.float32)
    k_rinv = k @ r.T
    x_, y_, z_ = sep(us / scale, vs / scale)
    px = k_rinv[0, 0] * x_ + k_rinv[0, 1] * y_ + k_rinv[0, 2] * z_
    py = k_rinv[1, 0] * x_ + k_rinv[1, 1] * y_ + k_rinv[1, 2] * z_
    pz = k_rinv[2, 0] * x_ + k_rinv[2, 1] * y_ + k_rinv[2, 2] * z_
    pz = jnp.broadcast_to(pz, (vs.shape[0], us.shape[0]))
    valid = pz > 0
    zs = jnp.where(jnp.abs(pz) < 1e-12, 1e-12, pz)
    return (jnp.where(valid, jnp.broadcast_to(px, zs.shape) / zs, -1.0),
            jnp.where(valid, jnp.broadcast_to(py, zs.shape) / zs, -1.0),
            valid)


@functools.partial(jax.jit, static_argnames=("proj_name", "dst_h", "dst_w",
                                             "interp", "border"))
def _warp_kernel(src: Array, k: Array, r: Array, scale: Array,
                 dst_tl: Array, *, proj_name: str, dst_h: int, dst_w: int,
                 interp: str, border: str) -> Array:
    """Fused backward-map + gather producing the dst ROI."""
    h, w = src.shape[0], src.shape[1]
    vs = dst_tl[1] + jnp.arange(dst_h, dtype=jnp.float32)
    us = dst_tl[0] + jnp.arange(dst_w, dtype=jnp.float32)
    sx, sy, valid = backward_xy_1d(proj_name, us, vs, k, r, scale)

    img = src.astype(jnp.float32)
    if img.ndim == 2:
        img = img[..., None]

    if interp == "nearest":
        xi = jnp.round(sx).astype(jnp.int32)
        yi = jnp.round(sy).astype(jnp.int32)
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h) & valid
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        out = img[yi, xi]
        if border == "constant":
            out = jnp.where(inside[..., None], out, 0.0)
    else:  # bilinear
        if border == "reflect":
            # BORDER_REFLECT: -1 -> 0, -2 -> 1, w -> w-1 (edge duplicated).
            def reflect(c, n):
                period = 2 * n
                c = jnp.mod(c, period)
                return jnp.where(c >= n, period - 1 - c, c)
            x0 = jnp.floor(sx)
            y0 = jnp.floor(sy)
            fx = sx - x0
            fy = sy - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            x0r = reflect(x0i, w)
            x1r = reflect(x0i + 1, w)
            y0r = reflect(y0i, h)
            y1r = reflect(y0i + 1, h)
            i00 = img[y0r, x0r]
            i01 = img[y0r, x1r]
            i10 = img[y1r, x0r]
            i11 = img[y1r, x1r]
            fx = fx[..., None]
            fy = fy[..., None]
            out = (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
                   i10 * (1 - fx) * fy + i11 * fx * fy)
            out = jnp.where(valid[..., None], out, 0.0)
        else:  # constant border
            x0 = jnp.floor(sx)
            y0 = jnp.floor(sy)
            fx = (sx - x0)[..., None]
            fy = (sy - y0)[..., None]
            x0i = jnp.clip(x0.astype(jnp.int32), -1, w)
            y0i = jnp.clip(y0.astype(jnp.int32), -1, h)

            def fetch(yy, xx):
                inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
                val = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
                return jnp.where(inside[..., None], val, 0.0)
            i00 = fetch(y0i, x0i)
            i01 = fetch(y0i, x0i + 1)
            i10 = fetch(y0i + 1, x0i)
            i11 = fetch(y0i + 1, x0i + 1)
            out = (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
                   i10 * (1 - fx) * fy + i11 * fx * fy)
            out = jnp.where(valid[..., None], out, 0.0)
    if src.ndim == 2:
        out = out[..., 0]
    return out


@dataclasses.dataclass(frozen=True)
class Warper:
    """A rotation warper of a given projection family and scale.

    Mirrors cv::detail::RotationWarper: `warp` returns (corner, image);
    `warp_roi` returns the dst rectangle only (used at
    `image_stitching.cpp:1138`).
    """
    proj_name: str
    scale: float

    def _prep(self, k, r):
        """For 'affine', the input 'R' is a 3x3 homogeneous affine H; OpenCV
        (AffineWarper::getRTfromHomogeneous) splits it into a linear part
        (translation zeroed) and a translation that becomes a pure UV offset
        of the plane projection (scale * (H02, H12), since t_z = 0)."""
        if self.proj_name == "affine":
            h = np.asarray(r, np.float32).copy()
            t0, t1 = float(h[0, 2]), float(h[1, 2])
            h[0, 2] = 0.0
            h[1, 2] = 0.0
            # Decoded numerically from cv2.PyRotationWarper("affine"):
            # u = scale*((H_lin^T @ K^-1 p).x/z - (H_lin^T t).x), i.e. the
            # plane projector with R = H_lin^T and a UV offset of
            # -scale * H_lin^T (t0, t1, 0).
            off = (-self.scale * (h[0, 0] * t0 + h[1, 0] * t1),
                   -self.scale * (h[0, 1] * t0 + h[1, 1] * t1))
            return k, h.T.copy(), off
        return k, r, (0.0, 0.0)

    # -- ROI detection (host-side numpy: tiny border math) -----------------
    def detect_result_roi(self, src_hw: Tuple[int, int], k: np.ndarray,
                          r: np.ndarray) -> Tuple[int, int, int, int]:
        """Map the source border (plus pole checks for full-sphere
        projections) forward; return (tl_x, tl_y, br_x, br_y) inclusive of
        br like OpenCV (dst size = br - tl + 1)."""
        h, w = src_hw
        k, r, off = self._prep(k, r)
        xs = np.arange(w, dtype=np.float32)
        ys = np.arange(h, dtype=np.float32)
        border = np.concatenate([
            np.stack([xs, np.zeros_like(xs)], -1),
            np.stack([xs, np.full_like(xs, h - 1)], -1),
            np.stack([np.zeros_like(ys), ys], -1),
            np.stack([np.full_like(ys, w - 1), ys], -1),
        ])
        if self.proj_name in ("spherical", "cylindrical"):
            # These use border-only scanning (detectResultRoiByBorder);
            # spherical adds the pole fix below.  Including interior points
            # here would overshoot OpenCV's ROI near a visible pole.
            pts = border
        else:
            # Generic detectResultRoi maps every pixel; a coarse interior
            # grid catches the interior extrema (fisheye/stereographic)
            # at a fraction of the cost.
            step = max(1, min(h, w) // 16)
            gy, gx = np.mgrid[0:h:step, 0:w:step].astype(np.float32)
            interior = np.stack([gx.ravel(), gy.ravel()], -1)
            pts = np.concatenate([border, interior])
        u, v = _forward_uv_np(self.proj_name, pts, k, r, self.scale)
        u = u + off[0]
        v = v + off[1]
        if self.proj_name in ("spherical", "cylindrical", "mercator"):
            # Date-line fix: a view straddling azimuth +-pi gets u values
            # on both branch ends, so the naive min/max spans the whole
            # 2*pi*scale period (observed: one 8-deg mosaic tile with a
            # 16404-px-wide ROI vs 364 px for its neighbors, inflating the
            # padded warp stack 19x).  For the projections whose u is
            # linear in longitude, re-branch u around the image center's
            # azimuth; keep the result only when it is genuinely tighter —
            # a pole-in-view image really does span all longitudes and
            # keeps the full-width ROI (cv2 semantics).  Rect corners may
            # then lie outside [-pi*s, pi*s]; every backward map is
            # periodic in u, so compositing is unaffected and the wrap
            # tile contributes at one canvas edge instead of both.
            period = 2.0 * math.pi * self.scale
            if float(u.max()) - float(u.min()) > 0.5 * period:
                cu, _ = _forward_uv_np(
                    self.proj_name,
                    np.array([[(w - 1) / 2.0, (h - 1) / 2.0]], np.float32),
                    k, r, self.scale)
                cu = float(cu[0]) + off[0]
                u2 = np.mod(u - cu + 0.5 * period, period) - \
                    0.5 * period + cu
                if float(u2.max()) - float(u2.min()) <= 0.5 * period:
                    u = u2
        tl_u, tl_v = float(u.min()), float(v.min())
        br_u, br_v = float(u.max()), float(v.max())

        if self.proj_name == "spherical":
            tl_u, tl_v, br_u, br_v = self._spherical_pole_fix(
                src_hw, k, r, tl_u, tl_v, br_u, br_v)
        return (int(tl_u), int(tl_v), int(br_u), int(br_v))

    def _spherical_pole_fix(self, src_hw, k, r, tl_u, tl_v, br_u, br_v):
        """SphericalWarper::detectResultRoi pole handling: when either pole
        projects inside the source image, the ROI is extended to include
        the warped-plane origin (u, v) = (0, 0) — decoded numerically from
        cv2.PyRotationWarper with straight-up and straight-down cameras."""
        h, w = src_hw
        k = np.asarray(k, np.float64)
        r = np.asarray(r, np.float64)
        k_rinv = k @ r.T
        for pole_y in (1.0, -1.0):
            ray = np.array([0.0, pole_y, 0.0])
            p = k_rinv @ ray
            if p[2] > 0:
                x, y = p[0] / p[2], p[1] / p[2]
                if 0 < x < w and 0 < y < h:
                    tl_u = min(tl_u, 0.0)
                    br_u = max(br_u, 0.0)
                    tl_v = min(tl_v, 0.0)
                    br_v = max(br_v, 0.0)
        return tl_u, tl_v, br_u, br_v

    # -- public API ----------------------------------------------------------
    def warp_point(self, xy, k, r):
        k, r, off = self._prep(k, r)
        u, v = _forward_uv_np(self.proj_name, np.asarray(xy, np.float32),
                              k, r, self.scale)
        return u + off[0], v + off[1]

    def warp_roi(self, src_hw: Tuple[int, int], k, r):
        """dst rect as (x, y, width, height) — cv::Rect semantics of
        RotationWarperBase::warpRoi."""
        tlx, tly, brx, bry = self.detect_result_roi(src_hw, k, r)
        return (tlx, tly, brx - tlx + 1, bry - tly + 1)

    def warp(self, src, k, r, interp: str = "linear",
             border: str = "reflect", dst_roi=None):
        """Warp `src`; returns (corner_xy, warped).

        interp: "linear" | "nearest";  border: "reflect" | "constant".
        Matches warper->warp(img, K, R, INTER_LINEAR, BORDER_REFLECT) /
        (mask, INTER_NEAREST, BORDER_CONSTANT) at `image_stitching.cpp:985-988`.
        """
        src = jnp.asarray(src)
        if dst_roi is None:
            tlx, tly, brx, bry = self.detect_result_roi(
                (src.shape[0], src.shape[1]), k, r)
        else:
            x, y, dw, dh = dst_roi
            tlx, tly, brx, bry = x, y, x + dw - 1, y + dh - 1
        dst_h = bry - tly + 1
        dst_w = brx - tlx + 1
        k, r, off = self._prep(k, r)
        out = _warp_kernel(
            src, jnp.asarray(k, jnp.float32), jnp.asarray(r, jnp.float32),
            jnp.float32(self.scale),
            jnp.asarray([tlx - off[0], tly - off[1]], jnp.float32),
            proj_name=self.proj_name, dst_h=int(dst_h), dst_w=int(dst_w),
            interp=interp, border=border)
        return (tlx, tly), out

    def warp_backward_coords(self, dst_roi, k, r):
        """Source coords + validity for every dst pixel (for fused ops)."""
        x, y, dw, dh = dst_roi
        k, r, off = self._prep(k, r)
        proj_bwd = PROJECTIONS[self.proj_name][1]
        vs = y - off[1] + jnp.arange(dh, dtype=jnp.float32)
        us = x - off[0] + jnp.arange(dw, dtype=jnp.float32)
        uu, vv = jnp.meshgrid(us, vs)
        return _backward_xy(proj_bwd, uu, vv, k, r, self.scale)


def u_period(proj_name: str, scale: float):
    """Warped u-axis period in pixels (rounded) for the projections whose
    u is linear in longitude — the set the date-line rebranch in
    detect_result_roi applies to.  None for aperiodic projections.  The
    <=0.5 px rounding only offsets cross-dateline PAIRING rects
    (seams.periodic_corner); per-image warps are unaffected."""
    if proj_name in ("spherical", "cylindrical", "mercator"):
        return int(round(2.0 * math.pi * scale))
    return None


def make_warper(warp_type: str, scale: float) -> Warper:
    """Factory with the reference's name set (`image_stitching.cpp:933-964`);
    unknown names raise like the `!warper_creator` check at `:967-971`."""
    if warp_type not in PROJECTIONS:
        raise ValueError(f"Can't create the following warper '{warp_type}'")
    return Warper(warp_type, float(scale))


def result_roi(corners, sizes) -> Tuple[int, int, int, int]:
    """cv::detail::resultRoi: union of per-image rects; (x, y, w, h)."""
    xs = [c[0] for c in corners]
    ys = [c[1] for c in corners]
    xe = [c[0] + s[0] for c, s in zip(corners, sizes)]
    ye = [c[1] + s[1] for c, s in zip(corners, sizes)]
    x, y = min(xs), min(ys)
    return (x, y, max(xe) - x, max(ye) - y)


def result_roi_intersection(corners, sizes) -> Tuple[int, int, int, int]:
    """cv::detail::resultRoiIntersection (timelapser CROP mode)."""
    xs = [c[0] for c in corners]
    ys = [c[1] for c in corners]
    xe = [c[0] + s[0] for c, s in zip(corners, sizes)]
    ye = [c[1] + s[1] for c, s in zip(corners, sizes)]
    x, y = max(xs), max(ys)
    return (x, y, min(xe) - x, min(ye) - y)
