"""Micro-profile the fused compositing program on the real TPU.

Dissects `pipeline.compose_fused._fused_compose_impl` (the hottest stage:
the reference's compose loop at image_stitching.cpp:1086-1225) into:

  warp-only        the vmapped backward warp (`_warp_stack`)
  bands=0          fused compose without the Laplacian pyramid
  full             fused compose with the production band count

Honest fresh-content timing per CLAUDE.md: inputs are perturbed on device
between reps so the axon runtime cannot memoize executions, and the clock
stops on a real device->host download.

Run:  python tools/profile_compose.py   (needs the TPU; ~2 compiles)
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_stitching_tpu.ops.warps import make_warper  # noqa: E402
from image_stitching_tpu.pipeline.compose_fused import (  # noqa: E402
    _fused_compose_impl, _warp_stack)

N, H, W = 8, 2448, 3264  # ~8 MP per image, the BASELINE config-3 scale
FOV = 55.0
OVERLAP = 0.5


def ring_geometry(n):
    focal = (W / 2.0) / math.tan(math.radians(FOV) / 2.0)
    k = np.array([[focal, 0, W / 2.0], [0, focal, H / 2.0], [0, 0, 1]],
                 np.float32)
    step = math.radians(FOV) * (1.0 - OVERLAP)
    rs = []
    for i in range(n):
        yaw = (i - (n - 1) / 2.0) * step
        c, s = math.cos(yaw), math.sin(yaw)
        rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32))
    return np.repeat(k[None], n, 0), np.stack(rs)


def timed(fn, *args, reps=4, perturb_idx=0):
    """Median wall time; perturbs args[perturb_idx] on device each rep and
    forces a download so axon memoization and async dispatch can't lie."""
    outs = fn(*args)
    jax.block_until_ready(outs)
    ts = []
    args = list(args)
    for r in range(reps):
        args[perturb_idx] = args[perturb_idx] + np.float32(r + 1)
        t0 = time.perf_counter()
        outs = fn(*args)
        first = jax.tree.leaves(outs)[0]
        np.asarray(first if first.ndim <= 2 else first[0, :2, :2])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ks, rs = ring_geometry(N)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (N, H, W, 3)).astype(np.float32))
    warper = make_warper("spherical", float(ks[0, 0, 0]))

    rois = [warper.warp_roi((H, W), ks[i], rs[i]) for i in range(N)]
    cx = min(r[0] for r in rois)
    cy = min(r[1] for r in rois)
    cw = max(r[0] + r[2] for r in rois) - cx
    ch = max(r[1] + r[3] for r in rois) - cy
    pad_w = max(r[2] for r in rois)
    pad_h = max(r[3] for r in rois)
    print(f"# canvas {cw}x{ch}, pad rect {pad_w}x{pad_h}", file=sys.stderr)

    # ---- warp-only --------------------------------------------------------
    tls = jnp.asarray([[r[0], r[1]] for r in rois], jnp.float32)
    ph8 = -(-pad_h // 8) * 8
    pw8 = -(-pad_w // 8) * 8
    t = timed(lambda imgs: _warp_stack(
        imgs, jnp.asarray(ks), jnp.asarray(rs),
        jnp.float32(warper.scale), tls, proj_name="spherical",
        pad_h=ph8, pad_w=pw8), images)
    mp = N * ph8 * pw8 / 1e6
    print(f"warp-only : {t * 1e3:8.1f} ms  ({mp / t:7.0f} warp-MP/s)")

    # ---- fused compose, bands in {0, 5} -----------------------------------
    seam_hw = (max(2, pad_h // 8), max(2, pad_w // 8))
    smasks = jnp.ones((N,) + seam_hw, jnp.float32)
    stls = jnp.asarray([[r[0] / 8.0, r[1] / 8.0] for r in rois],
                       jnp.float32)
    gains = jnp.ones((N,), jnp.float32)
    ggrids = jnp.ones((N, 2), jnp.float32)
    grois = jnp.asarray([[r[0], r[1], r[2], r[3]] for r in rois],
                        jnp.float32)

    for n_bands in (0, 5):
        step = 1 << max(n_bands, 1)
        cwb = -(-cw // step) * step
        chb = -(-ch // step) * step
        padw = min(-(-pad_w // step) * step, cwb)
        padh = min(-(-pad_h // step) * step, chb)
        tls_b = []
        for r in rois:
            tlx = cx + (((max(cx, r[0] - 3 * step) - cx) >> n_bands)
                        << n_bands)
            tly = cy + (((max(cy, r[1] - 3 * step) - cy) >> n_bands)
                        << n_bands)
            tls_b.append([min(tlx, cx + cwb - padw),
                          min(tly, cy + chb - padh)])
        t = timed(lambda imgs, nb=n_bands, pw=padw, ph=padh,
                  tb=jnp.asarray(tls_b, jnp.float32),
                  cwbb=cwb, chbb=chb: _fused_compose_impl(
                      imgs, jnp.asarray(ks), jnp.asarray(rs),
                      jnp.float32(warper.scale), tb,
                      jnp.asarray([cx, cy], jnp.float32),
                      smasks, stls, jnp.float32(0.125), gains, ggrids,
                      grois, proj_name="spherical", pad_h=ph, pad_w=pw,
                      canvas_h=chbb, canvas_w=cwbb, n_bands=nb,
                      seam_pad_h=seam_hw[0], seam_pad_w=seam_hw[1],
                      gain_mode="none"), images)
        cmp_mp = cwb * chb / 1e6
        print(f"bands={n_bands}   : {t * 1e3:8.1f} ms  "
              f"({cmp_mp / t:7.0f} canvas-MP/s)")


def layout_probe():
    """HWC (C=3 minormost) vs planar CHW for the pyramid blur: on TPU the
    minormost axis maps to the 128-lane dimension, so C=3 may waste the
    VPU; measure both on an 8 MP image."""
    import functools

    from image_stitching_tpu.ops.blend import _K5

    h, w = 2448, 3264
    rng = np.random.default_rng(0)
    img_hwc = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    img_chw = jnp.transpose(img_hwc, (2, 0, 1))

    @jax.jit
    def sep5_hwc(x):
        xp = jnp.pad(x, [(2, 2), (0, 0), (0, 0)], mode="reflect")
        x = sum(float(_K5[i]) * xp[i:i + x.shape[0]] for i in range(5))
        xp = jnp.pad(x, [(0, 0), (2, 2), (0, 0)], mode="reflect")
        x = sum(float(_K5[i]) * xp[:, i:i + x.shape[1]] for i in range(5))
        return x[::2, ::2]

    @jax.jit
    def sep5_chw(x):
        xp = jnp.pad(x, [(0, 0), (2, 2), (0, 0)], mode="reflect")
        x = sum(float(_K5[i]) * xp[:, i:i + x.shape[1]] for i in range(5))
        xp = jnp.pad(x, [(0, 0), (0, 0), (2, 2)], mode="reflect")
        x = sum(float(_K5[i]) * xp[:, :, i:i + x.shape[2]] for i in range(5))
        return x[:, ::2, ::2]

    for name, fn, x in [("pyr_down HWC", sep5_hwc, img_hwc),
                        ("pyr_down CHW", sep5_chw, img_chw)]:
        t = timed(fn, x, reps=6)
        print(f"{name}: {t * 1e3:7.2f} ms  ({h * w / 1e6 / t:6.0f} MP/s)")


if __name__ == "__main__":
    if "--layout" in sys.argv:
        layout_probe()
    else:
        main()
