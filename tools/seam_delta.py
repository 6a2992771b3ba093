"""Quantify the batched-DP vs strict-sequential seam delta (VERDICT r03 #9).

The pipeline's DP seam finder computes component/cost/side tables ONCE
from the initial masks and batches all component DPs into a few device
dispatches, then applies partitions sequentially (PARITY.md known
deltas).  OpenCV's `cv::detail::DpSeamFinder` recomputes everything per
pair against the masks EVOLVED by earlier pairs
(`image_stitching.cpp:1032-1065` machinery), so seam placement in 3+-way
overlap regions can differ.  `find_seams(..., strict=True)` replicates
the strict order (one dispatch per pair — a parity mode, not a fast
path); this tool measures the pixel-ownership disagreement between the
two on a rig37-class scene (multi-ring, pole rings, heavy 3+-way
overlap) and on the 8-image e2e ring.

Usage: JAX_PLATFORMS=cpu python tools/seam_delta.py
Prints one JSON line per scene; paste the numbers into PARITY.md.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _warp_scene(images, k, rs, warp_type="spherical"):
    """The stitcher's loop warp path (stitcher.py:538-548) with
    ground-truth cameras — seam parity needs no registration."""
    import jax.numpy as jnp
    from image_stitching_tpu.ops.warps import make_warper, u_period

    focal = float(k[0, 0])
    warper = make_warper(warp_type, focal)
    corners, images_warped, masks_warped = [], [], []
    for i, im in enumerate(images):
        roi = warper.warp_roi(im.shape[:2], k.astype(np.float32),
                              rs[i].astype(np.float32))
        _, img_w = warper.warp(jnp.asarray(im, jnp.float32),
                               k.astype(np.float32),
                               rs[i].astype(np.float32), dst_roi=roi)
        mask = np.full(im.shape[:2], 255, np.uint8)
        _, mask_w = warper.warp(jnp.asarray(mask), k.astype(np.float32),
                                rs[i].astype(np.float32), interp="nearest",
                                border="constant", dst_roi=roi)
        corners.append((roi[0], roi[1]))
        images_warped.append(np.asarray(img_w))
        masks_warped.append(np.asarray(mask_w).astype(np.uint8))
    period = u_period(warper.proj_name, warper.scale)
    return corners, images_warped, masks_warped, period


def _ownership(masks, corners, period=None):
    """Exclusive owner map over the union canvas (-1 = uncovered).

    With `period` (full-360 projections), the canvas u-axis is FOLDED
    mod the period: a pixel and its dateline alias are the same physical
    ray, and seam modes may legitimately surrender opposite wrap strips
    (flat-canvas coverage then differs while physical coverage does not).
    The folded map is the honest comparison space."""
    xs = [c[0] for c in corners]
    ys = [c[1] for c in corners]
    x0 = min(xs)
    y0 = min(ys)
    x1 = max(c[0] + m.shape[1] for c, m in zip(corners, masks))
    y1 = max(c[1] + m.shape[0] for c, m in zip(corners, masks))
    w = int(round(period)) if period else x1 - x0
    owner = np.full((y1 - y0, w), -1, np.int16)
    for i, (c, m) in enumerate(zip(corners, masks)):
        ys_i, xs_i = np.nonzero(m > 0)
        gx = xs_i + c[0]
        gx = (gx % w) if period else gx - x0
        owner[ys_i + c[1] - y0, gx] = i
    return owner


def _cv2_seams(imgs_w, corners, masks_w):
    """Oracle: cv2.detail_DpSeamFinder("COLOR") on the same warped scene
    (test-only dependency, CLAUDE.md)."""
    import cv2
    finder = cv2.detail_DpSeamFinder("COLOR")
    srcs = [np.ascontiguousarray(im.astype(np.float32)) for im in imgs_w]
    umasks = [cv2.UMat(np.ascontiguousarray(m)) for m in masks_w]
    out = finder.find(srcs, [tuple(c) for c in corners], umasks)
    return [u.get() for u in out]


def _grid9_scene(seed=3):
    """Non-periodic 3x3 staggered grid over a shared structured texture
    with per-image gain: heavy 3+-way overlap, structured seam costs, and
    NO dateline — the clean scene for comparing against cv2 (whose finder
    has no periodic pair coupling)."""
    rng = np.random.default_rng(seed)
    h, w = 120, 160
    gy, gx = np.mgrid[0:400, 0:500].astype(np.float32)
    tex = (120 + 60 * np.sin(gx / 23.0) * np.cos(gy / 17.0)
           + 40 * np.sin((gx + gy) / 31.0))
    tex = np.stack([tex, np.roll(tex, 37, 0), np.roll(tex, 53, 1)], -1)
    imgs, corners, masks = [], [], []
    for r in range(3):
        for c in range(3):
            x0 = 8 + c * (w - 70) + int(rng.integers(-6, 7))
            y0 = 8 + r * (h - 60) + int(rng.integers(-6, 7))
            gain = float(rng.uniform(0.85, 1.15))
            im = tex[y0:y0 + h, x0:x0 + w] * gain
            im += rng.normal(0, 2.0, im.shape)
            imgs.append(np.clip(im, 0, 255).astype(np.float32))
            corners.append((x0, y0))
            masks.append(np.full((h, w), 255, np.uint8))
    return imgs, corners, masks


def measure_raw(scene, imgs_w, corners, masks_w, period=None):
    from image_stitching_tpu.ops import seams

    a = seams.find_seams(imgs_w, corners, [m.copy() for m in masks_w],
                         "dp_color", period=period)
    b = seams.find_seams(imgs_w, corners, [m.copy() for m in masks_w],
                         "dp_color", period=period, strict=True)
    oa = _ownership(a, corners, period)
    ob = _ownership(b, corners, period)
    covered = (oa >= 0) | (ob >= 0)

    def _dis(o1, o2):
        return float(((o1 != o2) & covered).sum() / max(1, covered.sum()))

    rec = {"scene": scene,
           "batched_vs_strict_pct": round(100 * _dis(oa, ob), 3),
           "coverage_delta_pct": round(
               100 * float(((oa >= 0) != (ob >= 0)).sum()
                           / max(1, covered.sum())), 4),
           "covered_px": int(covered.sum())}
    try:
        oc = _ownership(_cv2_seams(imgs_w, corners, masks_w), corners,
                        period)
        rec["batched_vs_cv2_pct"] = round(100 * _dis(oa, oc), 3)
        rec["strict_vs_cv2_pct"] = round(100 * _dis(ob, oc), 3)
    except Exception as e:  # cv2 absent outside the dev container
        rec["cv2"] = f"unavailable: {e}"
    print(json.dumps(rec))


def measure(scene, images, k, rs, warp_type="spherical"):
    corners, imgs_w, masks_w, period = _warp_scene(images, k, rs, warp_type)
    measure_raw(scene, imgs_w, corners, masks_w, period)


def main():
    from image_stitching_tpu.data.synth import (make_rig_captures,
                                                make_ring_captures)
    imgs, corners, masks = _grid9_scene()
    measure_raw("grid9_3way_structured", imgs, corners, masks)
    images, k, rs = make_rig_captures(hw=(240, 320), seed=21)
    measure("rig37_240x320", images, k, np.stack(rs))
    images, k, rs = make_ring_captures(n_images=8, hw=(240, 320),
                                       fov_deg=55, overlap_ratio=0.5,
                                       seed=5)
    measure("ring8_240x320", images, k, np.stack(rs))


if __name__ == "__main__":
    main()
