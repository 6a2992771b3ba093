"""OpenCV-oracle COMPOSE-ONLY baseline at the gigapixel bench geometry.

Anchors bench.py's `gigapixel` mode (271 MP streamed composite through
`fused_compose_strips`) against the reference's own compositing loop:
cv::detail::MultiBandBlender feed/blend plus the per-tile warp +
exposure apply + seam-mask merge (`image_stitching.cpp:1086-1229`), on
the SAME tile grid / camera geometry, CPU (the reference's compute
path in this container).  Registration/seam/exposure FITTING are not
timed in either system's number here — bench.py reports its compose_s
the same way, so the ratio is compose-vs-compose.

Memory realism: cv2's MultiBandBlender allocates full-canvas CV_16S
pyramids (~271 MP x 3ch x 2B x 4/3 x 2 maps ~= 2.9 GB) — fine in this
container's 125 GB RAM, impossible on a 16 GB accelerator, which is the
point of the strip design.

Usage: python tools/cv2_gigapixel.py [rows cols tile_h tile_w focal]
Writes one JSON line to stdout.
"""
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import cv2  # noqa: E402  (test oracle ONLY — CLAUDE.md)
from scipy.spatial.transform import Rotation as Rot  # noqa: E402


def main():
    args = sys.argv[1:]
    rows = int(args[0]) if len(args) > 0 else 12
    cols = int(args[1]) if len(args) > 1 else 24
    h = int(args[2]) if len(args) > 2 else 1024
    w = int(args[3]) if len(args) > 3 else 1536
    focal = float(args[4]) if len(args) > 4 else 6000.0
    n = rows * cols
    overlap = 0.25
    yaw_step = (w / focal) * (1 - overlap)
    pitch_step = (h / focal) * (1 - overlap)
    k = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                 np.float32)
    rs = [
        (Rot.from_euler("y", yaw_step * (c - (cols - 1) / 2))
         * Rot.from_euler("x", pitch_step * (r - (rows - 1) / 2))
         ).as_matrix().astype(np.float32)
        for r in range(rows) for c in range(cols)]

    warper = cv2.PyRotationWarper("spherical", focal)
    rois = [warper.warpRoi((w, h), k, rs[i]) for i in range(n)]
    corners = [(r_[0], r_[1]) for r_ in rois]
    sizes = [(r_[2], r_[3]) for r_ in rois]
    dst = cv2.detail.resultRoi(corners=corners, sizes=sizes)
    canvas_mp = dst[2] * dst[3] / 1e6
    print(f"# cv2 gigapixel: {n} tiles, canvas {dst[3]}x{dst[2]} = "
          f"{canvas_mp:.1f} MP", file=sys.stderr)

    blend_width = math.sqrt(dst[2] * dst[3]) * 5.0 / 100.0
    n_bands = max(int(math.ceil(math.log2(blend_width)) - 1), 1)
    blender = cv2.detail_MultiBandBlender()
    blender.setNumBands(n_bands)
    blender.prepare(dst)
    print(f"# bands {n_bands}", file=sys.stderr)

    rng = np.random.default_rng(2)
    t0 = time.perf_counter()
    t_warp = 0.0
    for i in range(n):
        # Tile generation excluded from the timed total (bench.py's
        # tiles are device-generated outside compose_s too).
        tg0 = time.perf_counter()
        tile = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        t0 += time.perf_counter() - tg0
        tw0 = time.perf_counter()
        corner, iw = warper.warp(tile, k, rs[i], cv2.INTER_LINEAR,
                                 cv2.BORDER_REFLECT)
        mask = np.full((h, w), 255, np.uint8)
        _, mw = warper.warp(mask, k, rs[i], cv2.INTER_NEAREST,
                            cv2.BORDER_CONSTANT)
        t_warp += time.perf_counter() - tw0
        blender.feed(iw.astype(np.int16), mw, corner)
        if (i + 1) % 48 == 0:
            print(f"# fed {i + 1}/{n} at {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr)
    pano, _mask = blender.blend(None, None)
    dt = time.perf_counter() - t0
    value = canvas_mp / dt
    print(f"# compose {dt:.1f}s (warp {t_warp:.1f}s of it), pano "
          f"{pano.shape}", file=sys.stderr)
    print(json.dumps({
        "metric": "cv2_gigapixel_composite",
        "value": round(value, 3),
        "unit": "canvas_MP/s",
        "canvas_mp": round(canvas_mp, 1),
        "compose_s": round(dt, 1),
        "n_tiles": n,
        "hardware": "container CPU (1 core)",
    }))


if __name__ == "__main__":
    main()
