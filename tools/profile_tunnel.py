"""Separate device-compute time from tunnel transfer time on axon.

Earlier probes sliced a corner of each output to force a sync — but if the
axon runtime ships the WHOLE buffer to the host per download, big-output
programs look slow even when the device program is fast.  Here every
program is timed twice:

  compute: the jitted fn ends in jnp.sum(...) -> downloads 4 bytes
  full   : the raw output array is downloaded

plus raw upload/download bandwidth for 1/8/32/96 MB buffers.

Run:  timeout 1800 python tools/profile_tunnel.py
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def bench(fn, make_args, reps=3):
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(*make_args(r))
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    rng = np.random.default_rng(0)

    # ---- raw tunnel bandwidth ---------------------------------------------
    for mb in (1, 8, 32, 96):
        n = mb * 1024 * 1024 // 4
        host = rng.uniform(0, 1, n).astype(np.float32)
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        jax.block_until_ready(dev)
        up = time.perf_counter() - t0
        # fresh content per download rep (memoization guard is for
        # executions; downloads may also be cached — perturb anyway)
        dev2 = dev + 1.0
        jax.block_until_ready(dev2)
        t0 = time.perf_counter()
        np.asarray(dev2)
        down = time.perf_counter() - t0
        print(f"{mb:3d} MB  up {up * 1e3:7.1f} ms ({mb / up:6.1f} MB/s)   "
              f"down {down * 1e3:7.1f} ms ({mb / down:6.1f} MB/s)")

    # ---- pyr_down: compute vs full download --------------------------------
    from image_stitching_tpu.ops.blend import pyr_down
    img = jax.device_put(
        rng.uniform(0, 255, (2448, 3264, 3)).astype(np.float32))
    jax.block_until_ready(img)

    @jax.jit
    def pd_sum(x):
        return jnp.sum(pyr_down(x))
    t = bench(pd_sum, lambda r: (img + np.float32(r),))
    print(f"pyr_down 8MP  compute-only     {t:8.1f} ms")
    t = bench(jax.jit(pyr_down), lambda r: (img + np.float32(r + 100),))
    print(f"pyr_down 8MP  + full download  {t:8.1f} ms")

    # ---- seam-scale warp stack: compute vs download -------------------------
    from image_stitching_tpu.ops.warps import PROJECTIONS, _backward_xy
    n, h, w = 8, 274, 365
    ph, pw = 296, 392
    focal = (w / 2) / math.tan(math.radians(55) / 2)
    k = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                 np.float32)
    ks = np.repeat(k[None], n, 0)
    step = math.radians(55) * 0.5
    rs = []
    for i in range(n):
        yaw = (i - (n - 1) / 2) * step
        c, s = math.cos(yaw), math.sin(yaw)
        rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32))
    rs = np.stack(rs)
    imgs = jax.device_put(rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32))
    tls = jnp.asarray(np.tile([-pw / 2, -ph / 2], (n, 1)), jnp.float32)
    proj_bwd = PROJECTIONS["spherical"][1]
    scale = jnp.float32(focal)
    jax.block_until_ready(imgs)

    def warp_body(ims, tl):
        def reflect(c, nn):
            period = 2 * nn
            c = jnp.mod(c, period)
            return jnp.where(c >= nn, period - 1 - c, c)

        def one(img, kk, rr, t):
            us = t[0] + jnp.arange(pw, dtype=jnp.float32)
            vs = t[1] + jnp.arange(ph, dtype=jnp.float32)
            uu, vv = jnp.meshgrid(us, vs)
            sx, sy, valid = _backward_xy(proj_bwd, uu, vv, kk, rr, scale)
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

    @jax.jit
    def warp_sum(ims, tl):
        return jnp.sum(warp_body(ims, tl))
    t = bench(warp_sum, lambda r: (imgs, tls + np.float32(r)))
    print(f"seam warp 8x0.1MP compute-only {t:8.1f} ms")

    @jax.jit
    def warp_u8(ims, tl):
        return jnp.clip(jnp.round(warp_body(ims, tl)), 0, 255
                        ).astype(jnp.uint8)
    t = bench(warp_u8, lambda r: (imgs, tls + np.float32(r + 50)))
    print(f"seam warp 8x0.1MP + u8 download{t:8.1f} ms")

    # ---- ORB detect stack compute-only --------------------------------------
    from image_stitching_tpu.ops.features.orb import orb_detect_stack
    gray = jax.device_put(
        rng.uniform(0, 255, (8, 2448, 3264)).astype(np.float32))
    jax.block_until_ready(gray)

    @jax.jit
    def det_sum(g):
        f = orb_detect_stack(g, n_features=1500)
        return (jnp.sum(f.xy) + jnp.sum(f.response) +
                jnp.sum(f.desc.astype(jnp.float32)) +
                jnp.sum(f.valid))
    t = bench(det_sum, lambda r: (gray + np.float32(r),))
    print(f"orb_detect_stack compute-only  {t:8.1f} ms")


if __name__ == "__main__":
    main()
