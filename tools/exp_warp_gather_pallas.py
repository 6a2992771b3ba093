"""Measure the Pallas warp-gather kernel vs the XLA 4-scalar-gather
bilinear sample at bench compose shapes (VERDICT r02 item 3).

Real spherical backward-warp coordinate fields (8-image yaw ring at
compose scale), download-honest timing (fresh pixel content per rep;
sync by downloading a value — jax.block_until_ready is NOT a barrier
through the axon tunnel, CLAUDE.md).

Usage: python tools/exp_warp_gather_pallas.py          # real TPU
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402
from image_stitching_tpu.kernels.warp_gather_pallas import (  # noqa: E402
    tile_spans_ok, warp_bilinear_pallas)
from image_stitching_tpu.ops.warps import PROJECTIONS, _backward_xy  # noqa: E402

N, HC, WC = 8, 547, 730        # compose-scale source images
PH, PW = 544, 832              # padded per-image canvas rects
FOCAL = 700.0


def make_coords():
    """Spherical backward-warp fields for an 8-image yaw ring."""
    proj_bwd = PROJECTIONS["spherical"][1]
    k = jnp.asarray([[FOCAL, 0, WC / 2], [0, FOCAL, HC / 2], [0, 0, 1]],
                    jnp.float32)
    sxs, sys_ = [], []
    for i in range(N):
        y = (i - N / 2) * 0.48
        r = jnp.asarray(
            [[np.cos(y), 0, np.sin(y)], [0, 1, 0],
             [-np.sin(y), 0, np.cos(y)]], jnp.float32)
        tlx = np.round((y * FOCAL - PW / 2) / 32) * 32
        us = tlx + jnp.arange(PW, dtype=jnp.float32)
        vs = -PH / 2 + jnp.arange(PH, dtype=jnp.float32)
        uu, vv = jnp.meshgrid(us, vs)
        sx, sy, _ = _backward_xy(proj_bwd, uu, vv, k, r,
                                 jnp.float32(FOCAL))
        sxs.append(jnp.clip(sx, 0.0, WC - 1.0))
        sys_.append(jnp.clip(sy, 0.0, HC - 1.0))
    return jnp.stack(sxs), jnp.stack(sys_)


def gather4(img, sx, sy):
    """The current _warp_gain_seam image sample (clamp variant)."""
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, WC - 1)
    x1i = jnp.clip(x0i + 1, 0, WC - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, HC - 1)
    y1i = jnp.clip(y0i + 1, 0, HC - 1)
    i00 = img[y0i, x0i]
    i01 = img[y0i, x1i]
    i10 = img[y1i, x0i]
    i11 = img[y1i, x1i]
    return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
            i10 * (1 - fx) * fy + i11 * fx * fy)


@jax.jit
def scan_gather4(imgs, sxs, sys_):
    def body(acc, inp):
        img, sx, sy = inp
        return acc + gather4(img, sx, sy).sum(), 0
    acc, _ = jax.lax.scan(body, jnp.float32(0), (imgs, sxs, sys_))
    return acc


def make_scan_pallas(s_rows, w_src):
    @jax.jit
    def scan_pallas(imgs_planar, sxs, sys_):
        def body(acc, inp):
            img, sx, sy = inp
            out = warp_bilinear_pallas(img, sx, sy, s_rows=s_rows,
                                       w_src=w_src)
            return acc + out.sum(), 0
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              (imgs_planar, sxs, sys_))
        return acc
    return scan_pallas


def main():
    sxs, sys_ = make_coords()
    sxs_np = np.asarray(sxs)
    sys_np = np.asarray(sys_)
    spans = [tile_spans_ok(sxs_np[i], sys_np[i], WC, HC)
             for i in range(N)]
    print("tile_spans_ok per image:", spans, flush=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (N, HC, WC, 3)).astype(
        np.float32))
    imgs_p = jnp.transpose(imgs, (0, 3, 1, 2))

    def sync(v):
        return float(jnp.ravel(v)[0])

    def timeit(fn, *args, reps=5):
        sync(fn(*args))
        shifts = [jnp.float32(i + 1) for i in range(reps)]
        t0 = time.perf_counter()
        outs = [fn(args[0] + s, *args[1:]) for s in shifts]
        sync(outs[-1])
        return (time.perf_counter() - t0 - 0.03) / reps

    a = sync(scan_gather4(imgs, sxs, sys_))
    for s_rows, w_src in ((24, 384), (16, 384), (24, 512)):
        if not all(tile_spans_ok(sxs_np[i], sys_np[i], WC, HC,
                                 s_rows, w_src) for i in range(N)):
            print(f"S={s_rows} W={w_src}: spans fail, skipped",
                  flush=True)
            continue
        fn = make_scan_pallas(s_rows, w_src)
        b = sync(fn(imgs_p, sxs, sys_))
        rel = abs(a - b) / abs(a)
        t = timeit(fn, imgs_p, sxs, sys_)
        print(f"pallas S={s_rows} W={w_src}: {t*1e3:7.2f} ms  "
              f"(checksum rel err {rel:.2e})", flush=True)
    t4 = timeit(scan_gather4, imgs, sxs, sys_)
    print(f"xla 4-scalar-gather:   {t4*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
