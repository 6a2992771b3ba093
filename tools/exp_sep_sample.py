"""Break down _warp_gain_seam's 370 ms (tools/exp_warp_cost.py) by gather
group, and measure separable-matmul replacements.

_warp_gain_seam performs 12 scalar gathers per output pixel: 4 for the
image bilinear sample, 4 for the exposure-gain map sample, 4 for the
seam-mask sample.  The gain and seam coordinates are SEPARABLE — gx/mx
depend only on u, gy/my only on v — so those samples are 1-D bilinear
resizes expressible as dense banded matrix products (MXU work, like
ops/pyr_mat.py), leaving only the image sample as a true 2-D gather.

Variants (scan over 8 images, bench shapes, download-honest):
  img4     image sample only, 4 scalar gathers (current structure)
  img2     image sample only, 2 (1,2,3)-slice gathers (rows y0/y1)
  seamG    seam-mask sample only, scalar gathers (current)
  seamM    seam-mask sample only, banded matmul
  gainG    gain sample only, scalar gathers (current)
  gainM    gain sample only, banded matmul
  fullG    full _warp_gain_seam (all-gather baseline)
  fullM    image 4-gather + seam/gain matmul (candidate to ship)

Usage: python tools/exp_sep_sample.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402
from image_stitching_tpu.ops.warps import PROJECTIONS, _backward_xy  # noqa: E402
from image_stitching_tpu.pipeline.compose_fused import (  # noqa: E402
    _warp_gain_seam, _bilinear_sample)

N, HC, WC = 8, 547, 730
PH, PW = 544, 832
SH, SW = 288, 448
GH, GW = 9, 12
FOCAL = 700.0
proj_bwd = PROJECTIONS["spherical"][1]


def make_inputs(seed, shift):
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 255, (N, HC, WC, 3)).astype(np.float32) + shift
    k = np.array([[FOCAL, 0, WC / 2], [0, FOCAL, HC / 2], [0, 0, 1]],
                 np.float32)
    ks = np.repeat(k[None], N, 0)
    yaws = (np.arange(N) - N / 2) * 0.48
    rs = np.stack([np.array(
        [[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]],
        np.float32) for y in yaws])
    scale = FOCAL
    tls = np.zeros((N, 2), np.float32)
    tls[:, 0] = np.round((yaws * scale - PW / 2) / 32) * 32
    tls[:, 1] = -PH / 2
    smask = (rng.uniform(0, 1, (N, SH, SW)) > 0.3).astype(np.float32)
    stls = tls * 0.5
    gains = rng.uniform(0.9, 1.1, (N, GH, GW)).astype(np.float32)
    ggrids = np.tile(np.array([float(GH), float(GW)], np.float32), (N, 1))
    grois = np.stack([np.array([tls[i, 0], tls[i, 1], PW, PH], np.float32)
                      for i in range(N)])
    return (jnp.asarray(images), jnp.asarray(ks), jnp.asarray(rs),
            jnp.float32(scale), jnp.asarray(tls),
            jnp.asarray(smask), jnp.asarray(stls), jnp.float32(0.5),
            jnp.asarray(gains), jnp.asarray(ggrids), jnp.asarray(grois))


def _coords(tl):
    us = tl[0] + jnp.arange(PW, dtype=jnp.float32)
    vs = tl[1] + jnp.arange(PH, dtype=jnp.float32)
    return us, vs


def interp_matrix(coords, n_src):
    """Dense bilinear 1-D interpolation matrix M (n_src, n_out):
    out = M.T @ src  ==  _bilinear_sample(src_1d, coords, fill=0)."""
    i = jnp.arange(n_src, dtype=jnp.float32)[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[None, :] - i))


def seam_matmul(smask, stl, sr, tl):
    us, vs = _coords(tl)
    mx = us * sr - stl[0]
    my = vs * sr - stl[1]
    mv = interp_matrix(my, SH)
    mu = interp_matrix(mx, SW)
    return mv.T @ smask @ mu


def gain_matmul(gain, ggrid, groi, tl):
    us, vs = _coords(tl)
    gh_i, gw_i = ggrid[0], ggrid[1]
    gx = jnp.clip((us - groi[0] + 0.5) * gw_i / groi[2] - 0.5,
                  0.0, gw_i - 1.0)
    gy = jnp.clip((vs - groi[1] + 0.5) * gh_i / groi[3] - 0.5,
                  0.0, gh_i - 1.0)
    mv = interp_matrix(gy, GH)
    mu = interp_matrix(gx, GW)
    return mv.T @ gain @ mu


def img_sample4(img, sx, sy):
    hc, wc = img.shape[0], img.shape[1]

    def reflect(c, nn):
        period = 2 * nn
        c = jnp.mod(c, period)
        return jnp.where(c >= nn, period - 1 - c, c)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0r = reflect(x0i, wc)
    x1r = reflect(x0i + 1, wc)
    y0r = reflect(y0i, hc)
    y1r = reflect(y0i + 1, hc)
    i00 = img[y0r, x0r]
    i01 = img[y0r, x1r]
    i10 = img[y1r, x0r]
    i11 = img[y1r, x1r]
    return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
            i10 * (1 - fx) * fy + i11 * fx * fy)


def img_sample2(img, sx, sy):
    """Two (1,2,C)-slice gathers (rows y0, y1), clamp-edge semantics."""
    hc, wc = img.shape[0], img.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    fx = jnp.where(x0i < 0, 0.0, jnp.where(x0i > wc - 2, 1.0, fx))[..., None]
    bx = jnp.clip(x0i, 0, wc - 2).reshape(-1)
    y0c = jnp.clip(y0i, 0, hc - 1).reshape(-1)
    y1c = jnp.clip(y0i + 1, 0, hc - 1).reshape(-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    sizes = (1, 2, img.shape[2])

    def row(by):
        idx = jnp.stack([by, bx], axis=-1)
        p = jax.lax.gather(img, idx, dn, slice_sizes=sizes,
                           mode=jax.lax.GatherScatterMode.CLIP)
        return p.reshape(sy.shape + p.shape[1:])
    p0 = row(y0c)
    p1 = row(y1c)
    r0 = p0[..., 0, :] * (1 - fx) + p0[..., 1, :] * fx
    r1 = p1[..., 0, :] * (1 - fx) + p1[..., 1, :] * fx
    return r0 * (1 - fy) + r1 * fy


def _scan(body, xs):
    acc, _ = jax.lax.scan(lambda a, inp: (a + body(inp), 0),
                          jnp.float32(0), xs)
    return acc


@jax.jit
def img4(images, ks, rs, scale, tls, smask, stls, sr, gains, ggrids, grois):
    def body(inp):
        img, k, r, tl = inp
        us, vs = _coords(tl)
        uu, vv = jnp.meshgrid(us, vs)
        sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
        return img_sample4(img, sx, sy).sum()
    return _scan(body, (images, ks, rs, tls))


@jax.jit
def img2(images, ks, rs, scale, tls, smask, stls, sr, gains, ggrids, grois):
    def body(inp):
        img, k, r, tl = inp
        us, vs = _coords(tl)
        uu, vv = jnp.meshgrid(us, vs)
        sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
        return img_sample2(img, sx, sy).sum()
    return _scan(body, (images, ks, rs, tls))


@jax.jit
def seamG(images, ks, rs, scale, tls, smask, stls, sr, gains, ggrids, grois):
    def body(inp):
        sm, stl, tl = inp
        us, vs = _coords(tl)
        uu, vv = jnp.meshgrid(us, vs)
        return _bilinear_sample(sm, uu * sr - stl[0], vv * sr - stl[1]).sum()
    return _scan(body, (smask, stls, tls))


@jax.jit
def seamM(images, ks, rs, scale, tls, smask, stls, sr, gains, ggrids, grois):
    def body(inp):
        sm, stl, tl = inp
        return seam_matmul(sm, stl, sr, tl).sum()
    return _scan(body, (smask, stls, tls))


@jax.jit
def gainG(images, ks, rs, scale, tls, smask, stls, sr, gains, ggrids, grois):
    def body(inp):
        g, gg, gr, tl = inp
        us, vs = _coords(tl)
        uu, vv = jnp.meshgrid(us, vs)
        gh_i, gw_i = gg[0], gg[1]
        gx = jnp.clip((uu - gr[0] + 0.5) * gw_i / gr[2] - 0.5,
                      0.0, gw_i - 1.0)
        gy = jnp.clip((vv - gr[1] + 0.5) * gh_i / gr[3] - 0.5,
                      0.0, gh_i - 1.0)
        return _bilinear_sample(g, gx, gy).sum()
    return _scan(body, (gains, ggrids, grois, tls))


@jax.jit
def gainM(images, ks, rs, scale, tls, smask, stls, sr, gains, ggrids, grois):
    def body(inp):
        g, gg, gr, tl = inp
        return gain_matmul(g, gg, gr, tl).sum()
    return _scan(body, (gains, ggrids, grois, tls))


@jax.jit
def fullG(images, ks, rs, scale, tls, smask, stls, sr, gains, ggrids, grois):
    def body(inp):
        img, k, r, tl, sm, stl, g, gg, gr = inp
        us, vs = _coords(tl)
        warped, weight = _warp_gain_seam(
            img, k, r, us, vs, scale, sm, stl, sr, g, gg, gr,
            proj_bwd=proj_bwd, gain_mode="blocks")
        return warped.sum() + weight.sum()
    return _scan(body, (images, ks, rs, tls, smask, stls, gains,
                        ggrids, grois))


@jax.jit
def fullM(images, ks, rs, scale, tls, smask, stls, sr, gains, ggrids, grois):
    def body(inp):
        img, k, r, tl, sm, stl, g, gg, gr = inp
        us, vs = _coords(tl)
        uu, vv = jnp.meshgrid(us, vs)
        sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
        warped = img_sample4(img, sx, sy)
        xr = jnp.round(sx)
        yr = jnp.round(sy)
        hc, wc = img.shape[0], img.shape[1]
        wmask = valid & (xr >= 0) & (xr <= wc - 1) & (yr >= 0) & \
            (yr <= hc - 1)
        warped = warped * gain_matmul(g, gg, gr, tl)[..., None]
        sval = seam_matmul(sm, stl, sr, tl)
        weight = jnp.where((sval > 0.5) & wmask, 1.0, 0.0)
        return warped.sum() + weight.sum()
    return _scan(body, (images, ks, rs, tls, smask, stls, gains,
                        ggrids, grois))


def _sync(y):
    return float(jnp.ravel(y)[0])


def timeit(fn, reps=4):
    sets = [make_inputs(0, float(i)) for i in range(reps + 1)]
    for s in sets:
        _sync(s[0])
    _sync(fn(*sets[0]))
    t0 = time.perf_counter()
    outs = [fn(*s) for s in sets[1:]]
    _sync(outs[-1])
    return (time.perf_counter() - t0 - 0.03) / reps


def check_parity():
    """seam/gain matmul must match the gather sample exactly-ish."""
    s = make_inputs(1, 0.0)
    (images, ks, rs, scale, tls, smask, stls, sr, gains, ggrids,
     grois) = s
    us, vs = _coords(tls[0])
    uu, vv = jnp.meshgrid(us, vs)
    ref_s = _bilinear_sample(smask[0], uu * sr - stls[0][0],
                             vv * sr - stls[0][1])
    got_s = seam_matmul(smask[0], stls[0], sr, tls[0])
    gh_i, gw_i = ggrids[0][0], ggrids[0][1]
    gr = grois[0]
    gx = jnp.clip((uu - gr[0] + 0.5) * gw_i / gr[2] - 0.5, 0.0, gw_i - 1.0)
    gy = jnp.clip((vv - gr[1] + 0.5) * gh_i / gr[3] - 0.5, 0.0, gh_i - 1.0)
    ref_g = _bilinear_sample(gains[0], gx, gy)
    got_g = gain_matmul(gains[0], ggrids[0], gr, tls[0])
    print("seam matmul max|err|:", float(jnp.abs(ref_s - got_s).max()))
    print("gain matmul max|err|:", float(jnp.abs(ref_g - got_g).max()))


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    check_parity()
    for name, fn in [("img 4-scalar-gather   ", img4),
                     ("img 2-slice-gather    ", img2),
                     ("seam gather           ", seamG),
                     ("seam matmul           ", seamM),
                     ("gain gather           ", gainG),
                     ("gain matmul           ", gainM),
                     ("FULL all-gather (base)", fullG),
                     ("FULL img4+sep matmul  ", fullM)]:
        dt = timeit(fn)
        print(f"{name}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
