"""Dissect the bench-shape compositing stage on the real TPU.

Times `_fused_compose_impl` at the e2e bench's COMPOSE scale (0.4 MP per
image, the reference's compose_megapix default) three ways:

  impl+f32 dl (pallas)     the shipped program, Pallas warp-gather on
  impl+f32 dl (gather)     STITCH_NO_PALLAS path, XLA 4-scalar gather
  f32 canvas download      np.asarray of a canvas-sized device array
  u8 canvas download       the same bytes/4 (quantize-on-device option)

plus the traced span check's verdict on the real coordinate fields, so a
silent lax.cond fallback is visible.  Honest timing per CLAUDE.md: fresh
input content each rep, clock stops on a host download.

Run: python tools/exp_compose_breakdown.py       # real TPU
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402
from image_stitching_tpu.kernels.warp_gather_pallas import (  # noqa: E402
    spans_ok_device)
from image_stitching_tpu.ops.warps import _backward_xy  # noqa: E402
from image_stitching_tpu.ops.warps import PROJECTIONS, make_warper  # noqa: E402
from image_stitching_tpu.pipeline.compose_fused import (  # noqa: E402
    _fused_compose_impl)

N, H, W = 8, 547, 730          # compose-scale inputs (0.4 MP)
FOV = 55.0
OVERLAP = 0.5
N_BANDS = 5


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


def timed(fn, reps=4):
    fn(0)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        fn(r + 1)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ks, rs = ring_geometry(N)
    warper = make_warper("spherical", float(ks[0, 0, 0]))
    rois = [warper.warp_roi((H, W), ks[i], rs[i]) for i in range(N)]
    cx = min(r[0] for r in rois)
    cy = min(r[1] for r in rois)
    cw = max(r[0] + r[2] for r in rois) - cx
    ch = max(r[1] + r[3] for r in rois) - cy
    pad_w = max(r[2] for r in rois)
    pad_h = max(r[3] for r in rois)
    step = 1 << N_BANDS
    cwb = -(-cw // step) * step
    chb = -(-ch // step) * step
    padw = min(-(-pad_w // step) * step, cwb)
    padh = min(-(-pad_h // step) * step, chb)
    print(f"# canvas {cw}x{ch} (pad {cwb}x{chb}), rect {pad_w}x{pad_h} "
          f"(pad {padw}x{padh})", file=sys.stderr)

    # Span-check verdicts on the real fields (image 0 and the middle):
    # raw clamp (fails at warp_roi edges) vs valid-anchored.
    from image_stitching_tpu.kernels.warp_gather_pallas import (
        anchored_coords)
    proj_bwd = PROJECTIONS["spherical"][1]
    for i in (0, N // 2):
        tlx, tly = rois[i][0], rois[i][1]
        us = tlx + jnp.arange(padw, dtype=jnp.float32)
        vs = tly + jnp.arange(padh, dtype=jnp.float32)
        uu, vv = jnp.meshgrid(us, vs)
        sx, sy, val = _backward_xy(proj_bwd, uu, vv, jnp.asarray(ks[i]),
                                   jnp.asarray(rs[i]),
                                   jnp.float32(warper.scale))
        ok = bool(spans_ok_device(sx, sy, W, H))
        xr, yr = jnp.round(sx), jnp.round(sy)
        wmask = val & (xr >= 0) & (xr <= W - 1) & (yr >= 0) & \
            (yr <= H - 1)
        _, _, ok_a = anchored_coords(sx, sy, wmask, W, H)
        print(f"image {i}: spans_ok raw={ok} anchored={bool(ok_a)}",
              flush=True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (N, H, W, 3)).astype(np.float32))
    seam_hw = (max(2, pad_h // 8), max(2, pad_w // 8))
    smasks = jnp.ones((N,) + seam_hw, jnp.float32)
    stls = jnp.asarray([[r[0] / 8.0, r[1] / 8.0] for r in rois],
                       jnp.float32)
    gains = jnp.ones((N,), jnp.float32)
    ggrids = jnp.ones((N, 2), jnp.float32)
    grois = jnp.asarray([[r[0], r[1], r[2], r[3]] for r in rois],
                        jnp.float32)
    tls_b = []
    for r in rois:
        tlx = cx + (((max(cx, r[0] - 3 * step) - cx) >> N_BANDS)
                    << N_BANDS)
        tly = cy + (((max(cy, r[1] - 3 * step) - cy) >> N_BANDS)
                    << N_BANDS)
        tls_b.append([min(tlx, cx + cwb - padw), min(tly, cy + chb - padh)])
    tls_b = jnp.asarray(tls_b, jnp.float32)

    def run(use_pallas, shift):
        pano, mask = _fused_compose_impl(
            images + np.float32(shift), jnp.asarray(ks), jnp.asarray(rs),
            jnp.float32(warper.scale), tls_b,
            jnp.asarray([cx, cy], jnp.float32),
            smasks, stls, jnp.float32(0.125), gains, ggrids, grois,
            proj_name="spherical", pad_h=padh, pad_w=padw,
            canvas_h=chb, canvas_w=cwb, n_bands=N_BANDS,
            seam_pad_h=seam_hw[0], seam_pad_w=seam_hw[1],
            gain_mode="none", use_pallas=use_pallas)
        return np.asarray(pano), np.asarray(mask)

    for name, up in (("pallas", True), ("gather", False)):
        t = timed(lambda s, u=up: run(u, s))
        print(f"impl+f32 dl ({name}): {t*1e3:7.1f} ms", flush=True)

    a, ma = run(True, 0)
    b, mb = run(False, 0)
    m = ma & mb
    err = np.abs(a[m].astype(np.float32) - b[m].astype(np.float32)).max()
    print(f"pallas-vs-gather in-mask max abs err: {err:.3e}", flush=True)

    # Download-only cost at canvas size.
    canv = jnp.zeros((chb, cwb, 3), jnp.float32)
    canv8 = jnp.zeros((chb, cwb, 3), jnp.uint8)

    @jax.jit
    def addf(x, s):
        return x + s

    @jax.jit
    def addu(x, s):
        return x + jnp.uint8(s)

    tf = timed(lambda s: np.asarray(addf(canv, np.float32(s))))
    tu = timed(lambda s: np.asarray(addu(canv8, np.uint8(s % 250))))
    print(f"f32 canvas download: {tf*1e3:7.1f} ms", flush=True)
    print(f"u8  canvas download: {tu*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
