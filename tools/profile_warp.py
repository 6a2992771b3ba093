"""Dissect the backward-warp program cost on TPU.

The seam-scale `_warp_stack` (8 x 0.1MP) measured 518 ms — pathologically
slow for the pixel count.  This separates: projection math vs gather vs
layout (HWC channels-minor vs planar channel-major) vs image size.

Run:  timeout 1800 python tools/profile_warp.py
"""

import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_stitching_tpu.ops.warps import PROJECTIONS, _backward_xy  # noqa: E402


def timed(fn, make_args, reps=3, label=""):
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(*make_args(r))
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
        ts.append(time.perf_counter() - t0)
    print(f"{label:<34} {np.median(ts) * 1e3:8.1f} ms")
    return float(np.median(ts))


def ring(n, h, w):
    focal = (w / 2) / math.tan(math.radians(55) / 2)
    k = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                 np.float32)
    step = math.radians(55) * 0.5
    rs = []
    for i in range(n):
        yaw = (i - (n - 1) / 2) * step
        c, s = math.cos(yaw), math.sin(yaw)
        rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32))
    return np.repeat(k[None], n, 0), np.stack(rs), focal


def main():
    n, h, w = 8, 274, 365            # seam scale shapes from the bench
    ph, pw = 296, 392
    ks, rs, focal = ring(n, h, w)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32))
    imgs_pl = jnp.transpose(imgs, (0, 3, 1, 2))  # planar N,C,H,W
    tls = jnp.asarray(np.tile([-pw / 2, -ph / 2], (n, 1)), jnp.float32)
    proj_bwd = PROJECTIONS["spherical"][1]
    scale = jnp.float32(focal)
    jax.block_until_ready(imgs_pl)

    # 1. projection math only (no gather)
    @jax.jit
    def proj_only(ims, tl):
        def one(img, k, r, t):
            us = t[0] + jnp.arange(pw, dtype=jnp.float32)
            vs = t[1] + jnp.arange(ph, dtype=jnp.float32)
            uu, vv = jnp.meshgrid(us, vs)
            sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
            return sx + sy + valid
        return jax.vmap(one)(ims, jnp.asarray(ks), jnp.asarray(rs), tl)
    timed(proj_only, lambda r: (imgs, tls + np.float32(r)),
          label="projection math only")

    def reflect(c, nn):
        period = 2 * nn
        c = jnp.mod(c, period)
        return jnp.where(c >= nn, period - 1 - c, c)

    # 2. HWC 4-tap gather warp (current production shape)
    @jax.jit
    def warp_hwc(ims, tl):
        def one(img, k, r, t):
            us = t[0] + jnp.arange(pw, dtype=jnp.float32)
            vs = t[1] + jnp.arange(ph, dtype=jnp.float32)
            uu, vv = jnp.meshgrid(us, vs)
            sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
            x0 = jnp.floor(sx); y0 = jnp.floor(sy)
            fx = (sx - x0)[..., None]; fy = (sy - y0)[..., None]
            x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
            i00 = img[reflect(y0i, h), reflect(x0i, w)]
            i01 = img[reflect(y0i, h), reflect(x0i + 1, w)]
            i10 = img[reflect(y0i + 1, h), reflect(x0i, w)]
            i11 = img[reflect(y0i + 1, h), reflect(x0i + 1, w)]
            return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
                    i10 * (1 - fx) * fy + i11 * fx * fy)
        return jax.vmap(one)(ims, jnp.asarray(ks), jnp.asarray(rs), tl)
    timed(warp_hwc, lambda r: (imgs, tls + np.float32(r)),
          label="warp HWC gather")

    # 3. planar CHW gather warp (channels leading; gather on (H, W) planes)
    @jax.jit
    def warp_chw(ims, tl):
        def one(img, k, r, t):              # img (3, H, W)
            us = t[0] + jnp.arange(pw, dtype=jnp.float32)
            vs = t[1] + jnp.arange(ph, dtype=jnp.float32)
            uu, vv = jnp.meshgrid(us, vs)
            sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
            x0 = jnp.floor(sx); y0 = jnp.floor(sy)
            fx = sx - x0; fy = sy - y0
            x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
            ya, yb = reflect(y0i, h), reflect(y0i + 1, h)
            xa, xb = reflect(x0i, w), reflect(x0i + 1, w)
            i00 = img[:, ya, xa]
            i01 = img[:, ya, xb]
            i10 = img[:, yb, xa]
            i11 = img[:, yb, xb]
            return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
                    i10 * (1 - fx) * fy + i11 * fx * fy)
        return jax.vmap(one)(ims, jnp.asarray(ks), jnp.asarray(rs), tl)
    timed(warp_chw, lambda r: (imgs_pl, tls + np.float32(r)),
          label="warp planar CHW gather")

    # 4. flat linear-index gather, planar
    @jax.jit
    def warp_flat(ims, tl):
        def one(img, k, r, t):              # img (3, H, W)
            flat = img.reshape(3, h * w)
            us = t[0] + jnp.arange(pw, dtype=jnp.float32)
            vs = t[1] + jnp.arange(ph, dtype=jnp.float32)
            uu, vv = jnp.meshgrid(us, vs)
            sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
            x0 = jnp.floor(sx); y0 = jnp.floor(sy)
            fx = sx - x0; fy = sy - y0
            x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
            ya, yb = reflect(y0i, h), reflect(y0i + 1, h)
            xa, xb = reflect(x0i, w), reflect(x0i + 1, w)
            g = lambda yy, xx: jnp.take(flat, yy * w + xx, axis=1)
            i00, i01 = g(ya, xa), g(ya, xb)
            i10, i11 = g(yb, xa), g(yb, xb)
            return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
                    i10 * (1 - fx) * fy + i11 * fx * fy)
        return jax.vmap(one)(ims, jnp.asarray(ks), jnp.asarray(rs), tl)
    timed(warp_flat, lambda r: (imgs_pl, tls + np.float32(r)),
          label="warp flat-index gather")

    # 5. same flat gather at 8x the pixels (does it scale with size?)
    n2, h2, w2 = 8, 816, 1088
    ks2, rs2, focal2 = ring(n2, h2, w2)
    imgs2 = jax.device_put(
        rng.uniform(0, 255, (n2, 3, h2, w2)).astype(np.float32))
    jax.block_until_ready(imgs2)
    ph2, pw2 = 832, 1152
    tls2 = jnp.asarray(np.tile([-pw2 / 2, -ph2 / 2], (n2, 1)), jnp.float32)
    scale2 = jnp.float32(focal2)

    @jax.jit
    def warp_flat2(ims, tl):
        def one(img, k, r, t):
            flat = img.reshape(3, h2 * w2)
            us = t[0] + jnp.arange(pw2, dtype=jnp.float32)
            vs = t[1] + jnp.arange(ph2, dtype=jnp.float32)
            uu, vv = jnp.meshgrid(us, vs)
            sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale2)
            x0 = jnp.floor(sx); y0 = jnp.floor(sy)
            fx = sx - x0; fy = sy - y0
            x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
            ya, yb = reflect(y0i, h2), reflect(y0i + 1, h2)
            xa, xb = reflect(x0i, w2), reflect(x0i + 1, w2)
            g = lambda yy, xx: jnp.take(flat, yy * w2 + xx, axis=1)
            i00, i01 = g(ya, xa), g(ya, xb)
            i10, i11 = g(yb, xa), g(yb, xb)
            return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
                    i10 * (1 - fx) * fy + i11 * fx * fy)
        return jax.vmap(one)(ims, jnp.asarray(ks2), jnp.asarray(rs2), tl)
    timed(warp_flat2, lambda r: (imgs2, tls2 + np.float32(r)),
          label="warp flat-index 8x pixels")


if __name__ == "__main__":
    main()
