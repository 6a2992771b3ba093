"""Isolate the fused-compose warp/gather cost on real TPU (download-honest).

The planar matmul pyramids cut the pyramid+accumulate to ~3 ms
(tools/exp_compose_planar.py), so whatever remains of the ~0.8-1.0 s
Compositing stage lives in the per-image `_warp_gain_seam` sample (4
scalar gathers + gain/seam bilinear samples + projection trig) or in the
scan structure itself.  Variants at bench shapes:

  full    the production _fused_compose_impl-shaped scan
          (warp+gain+seam + planar matmul pyramid accumulate)
  warpS   scan over images, _warp_gain_seam only (sum to keep it live)
  trig    scan, _backward_xy + arithmetic only (no gathers)
  warpV   vmap over images, _warp_gain_seam (scalar gathers)
  vmacc   vmapped warp -> planar stack -> accumulate-only scan
          (the v2 restructuring candidate)

Usage: python tools/exp_warp_cost.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402
from image_stitching_tpu.ops.warps import PROJECTIONS  # noqa: E402
from image_stitching_tpu.pipeline.compose_fused import (  # noqa: E402
    _warp_gain_seam, _backward_xy)
from image_stitching_tpu.ops.pyr_mat import (  # noqa: E402
    pyr_down_mm, pyr_up_mm)

N, HC, WC = 8, 547, 730            # compose-scale sources
PH, PW = 544, 832                  # padded warp rects
CH, CW, B = 544, 3040, 5           # canvas
SH, SW = 288, 448                  # seam-scale mask pads
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
    canvas_tl = np.array([tls[0, 0], -PH / 2], np.float32)
    smask = (rng.uniform(0, 1, (N, SH, SW)) > 0.3).astype(np.float32)
    stls = tls * 0.5
    gains = rng.uniform(0.9, 1.1, (N, 9, 12)).astype(np.float32)
    ggrids = np.tile(np.array([9.0, 12.0], np.float32), (N, 1))
    grois = np.stack([np.array([tls[i, 0], tls[i, 1], PW, PH], np.float32)
                      for i in range(N)])
    return (jnp.asarray(images), jnp.asarray(ks), jnp.asarray(rs),
            jnp.float32(scale), jnp.asarray(tls), jnp.asarray(canvas_tl),
            jnp.asarray(smask), jnp.asarray(stls), jnp.float32(0.5),
            jnp.asarray(gains), jnp.asarray(ggrids), jnp.asarray(grois))


def _rect_coords(tl):
    us = tl[0] + jnp.arange(PW, dtype=jnp.float32)
    vs = tl[1] + jnp.arange(PH, dtype=jnp.float32)
    return jnp.meshgrid(us, vs)


def _wgs(img, k, r, scale, tl, smask, stl, sr, gain, ggrid, groi):
    us = tl[0] + jnp.arange(PW, dtype=jnp.float32)
    vs = tl[1] + jnp.arange(PH, dtype=jnp.float32)
    return _warp_gain_seam(img, k, r, us, vs, scale, smask, stl, sr,
                           gain, ggrid, groi, proj_bwd=proj_bwd,
                           gain_mode="blocks")


def _accum_planar(x4_fn, inputs):
    (images, ks, rs, scale, tls, canvas_tl, smask, stls, sr, gains,
     ggrids, grois) = inputs
    accs = [jnp.zeros((4, CH >> b, CW >> b), jnp.float32)
            for b in range(B + 1)]

    def body(accs, inp):
        x4, tl = x4_fn(inp)
        gauss = [x4]
        for _ in range(B):
            gauss.append(pyr_down_mm(gauss[-1]))
        off = (tl - canvas_tl).astype(jnp.int32)
        na = []
        for b in range(B + 1):
            g = gauss[b]
            lap = (g - pyr_up_mm(gauss[b + 1], (g.shape[1], g.shape[2]))
                   if b < B else g)
            w = g[3:4]
            val = jnp.concatenate([lap[:3] * w, w], axis=0)
            ob = off >> b
            cur = jax.lax.dynamic_slice(
                accs[b], (0, ob[1], ob[0]), (4, g.shape[1], g.shape[2]))
            na.append(jax.lax.dynamic_update_slice(
                accs[b], cur + val, (0, ob[1], ob[0])))
        return na, 0

    accs, _ = jax.lax.scan(
        body, accs, (images, ks, rs, tls, smask, stls, gains, ggrids,
                     grois))
    return accs[0]


@jax.jit
def full(*inputs):
    (images, ks, rs, scale, tls, canvas_tl, smask, stls, sr, gains,
     ggrids, grois) = inputs

    def x4_fn(inp):
        img, k, r, tl, sm, stl, g, gg, gr = inp
        warped, weight = _wgs(img, k, r, scale, tl, sm, stl, sr, g, gg, gr)
        return jnp.concatenate(
            [jnp.transpose(warped, (2, 0, 1)), weight[None]], 0), tl
    return _accum_planar(x4_fn, inputs)


@jax.jit
def warp_scan(*inputs):
    (images, ks, rs, scale, tls, canvas_tl, smask, stls, sr, gains,
     ggrids, grois) = inputs

    def body(acc, inp):
        img, k, r, tl, sm, stl, g, gg, gr = inp
        warped, weight = _wgs(img, k, r, scale, tl, sm, stl, sr, g, gg, gr)
        return acc + warped.sum() + weight.sum(), 0
    acc, _ = jax.lax.scan(body, jnp.float32(0),
                          (images, ks, rs, tls, smask, stls, gains,
                           ggrids, grois))
    return acc


@jax.jit
def trig_scan(*inputs):
    (images, ks, rs, scale, tls, canvas_tl, smask, stls, sr, gains,
     ggrids, grois) = inputs

    def body(acc, inp):
        img, k, r, tl = inp
        uu, vv = _rect_coords(tl)
        sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
        return acc + sx.sum() + sy.sum() + valid.sum(), 0
    acc, _ = jax.lax.scan(body, jnp.float32(0), (images, ks, rs, tls))
    return acc


@jax.jit
def warp_vmap(*inputs):
    (images, ks, rs, scale, tls, canvas_tl, smask, stls, sr, gains,
     ggrids, grois) = inputs

    def one(img, k, r, tl, sm, stl, g, gg, gr):
        return _wgs(img, k, r, scale, tl, sm, stl, sr, g, gg, gr)
    w, wt = jax.vmap(one)(images, ks, rs, tls, smask, stls, gains,
                          ggrids, grois)
    return w.sum() + wt.sum()


@jax.jit
def vmap_acc(*inputs):
    (images, ks, rs, scale, tls, canvas_tl, smask, stls, sr, gains,
     ggrids, grois) = inputs

    def one(img, k, r, tl, sm, stl, g, gg, gr):
        warped, weight = _wgs(img, k, r, scale, tl, sm, stl, sr, g, gg, gr)
        return jnp.concatenate(
            [jnp.transpose(warped, (2, 0, 1)), weight[None]], 0)
    x4s = jax.vmap(one)(images, ks, rs, tls, smask, stls, gains,
                        ggrids, grois)

    def x4_fn(inp):
        x4, tl = inp
        return x4, tl
    accs = [jnp.zeros((4, CH >> b, CW >> b), jnp.float32)
            for b in range(B + 1)]

    def body(accs, inp):
        x4, tl = inp
        gauss = [x4]
        for _ in range(B):
            gauss.append(pyr_down_mm(gauss[-1]))
        off = (tl - canvas_tl).astype(jnp.int32)
        na = []
        for b in range(B + 1):
            g = gauss[b]
            lap = (g - pyr_up_mm(gauss[b + 1], (g.shape[1], g.shape[2]))
                   if b < B else g)
            w = g[3:4]
            val = jnp.concatenate([lap[:3] * w, w], axis=0)
            ob = off >> b
            cur = jax.lax.dynamic_slice(
                accs[b], (0, ob[1], ob[0]), (4, g.shape[1], g.shape[2]))
            na.append(jax.lax.dynamic_update_slice(
                accs[b], cur + val, (0, ob[1], ob[0])))
        return na, 0
    accs, _ = jax.lax.scan(body, accs, (x4s, tls))
    return accs[0]


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


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    for name, fn in [("trig only (scan)      ", trig_scan),
                     ("warp_gain_seam (scan)  ", warp_scan),
                     ("warp_gain_seam (vmap)  ", warp_vmap),
                     ("FULL scan compose      ", full),
                     ("vmap warp + accum scan ", vmap_acc)]:
        dt = timeit(fn)
        print(f"{name}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
