"""Canvas-strip streaming compose == whole-canvas fused compose.

The strips path (`pipeline/compose_fused.py::fused_compose_strips`) is the
bounded-memory gigapixel compositor (BASELINE config 5 at real scale; the
reference's blender grows an unbounded global canvas,
`image_stitching.cpp:1173-1229`).  These tests pin the strip scheduling —
rect clipping, recompute margins, pow2 dummy padding — against the
single-program `fused_compose` on geometries where strips genuinely split
the canvas and rects straddle strip boundaries.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from image_stitching_tpu.config import BlenderType
from image_stitching_tpu.ops.warps import make_warper
from image_stitching_tpu.pipeline.compose_fused import (fused_compose,
                                                        fused_compose_strips)


def _scene(n=5, h=48, w=64, focal=40.0, yaw_step=None):
    if yaw_step is None:
        yaw_step = 0.8 * w / focal
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    imgs = np.stack([
        np.stack([60 + xx + 9 * i, 70 + yy + 3 * i,
                  90 + 0.3 * xx + 0.2 * yy], -1)
        for i in range(n)]).astype(np.float32)
    imgs += rng.uniform(-1, 1, imgs.shape).astype(np.float32)
    imgs = np.clip(imgs, 0, 255)
    k = np.tile(np.array([[focal, 0, w / 2], [0, focal, h / 2],
                          [0, 0, 1]], np.float32), (n, 1, 1))
    rs = np.stack([R.from_euler("y", yaw_step * i).as_matrix()
                   .astype(np.float32) for i in range(n)])
    return imgs, k, rs


def _rois(warper, n, h, w, ks, rs):
    corners, sizes = [], []
    for i in range(n):
        x, y, ww, hh = warper.warp_roi((h, w), ks[i], rs[i])
        corners.append((x, y))
        sizes.append((ww, hh))
    return corners, sizes


def _compose_args(n=5, h=48, w=64, focal=40.0, blend=BlenderType.MULTI_BAND,
                  masks="full"):
    imgs, ks, rs = _scene(n=n, h=h, w=w, focal=focal)
    warper = make_warper("spherical", focal)
    corners, sizes = _rois(warper, n, h, w, ks, rs)
    rng = np.random.default_rng(3)
    seam_masks = []
    for i in range(n):
        m = np.full((sizes[i][1], sizes[i][0]), 255, np.uint8)
        if masks == "random":
            # Blocky random seams exercise the weight path per strip.
            blk = (rng.random((max(sizes[i][1] // 8, 1),
                               max(sizes[i][0] // 8, 1))) > 0.3)
            m = (np.kron(blk, np.ones((8, 8), bool))
                 [:sizes[i][1], :sizes[i][0]] * np.uint8(255))
        seam_masks.append(m)
    return (jnp.asarray(imgs), ks, rs, warper, corners, sizes,
            seam_masks, corners, 1.0, None, blend, 5.0)


@pytest.mark.parametrize("blend,strip_w", [
    (BlenderType.MULTI_BAND, 64),
    (BlenderType.MULTI_BAND, 96),
    (BlenderType.NO, 64),
])
def test_strips_match_fused_multiband(blend, strip_w):
    args = _compose_args(blend=blend)
    pano1, m1 = fused_compose(*args)
    pano2, m2 = fused_compose_strips(*args, strip_w=strip_w)
    assert pano2.shape == pano1.shape
    # Mask must be identical: weight support never depends on strips.
    assert np.array_equal(m1, m2)
    diff = np.abs(pano2 - pano1)[m1 & m2]
    # Same tolerance class as sharded-vs-fused: interior pixels agree to
    # pyramid boundary effects.
    assert float(np.mean(diff)) < 0.5, float(np.mean(diff))
    assert float(np.percentile(diff, 99)) <= 2.0


def test_strips_feather_exact():
    """FEATHER strips == fused bit-for-bit: the margin covers the EDT
    reach, so per-strip weight maps agree exactly (same guarantee the
    sharded path proves)."""
    args = _compose_args(blend=BlenderType.FEATHER, masks="random")
    pano1, m1 = fused_compose(*args)
    pano2, m2 = fused_compose_strips(*args, strip_w=64)
    assert np.array_equal(m1, m2)
    diff = np.abs(pano2 - pano1)[m1]
    assert float(diff.max()) == 0.0, float(diff.max())


def test_strips_uint8_stack_and_out_buffer():
    """u8 device stacks compose without an f32 blow-up, into a caller
    buffer (the gigapixel memmap path), and dummy pow2 padding slots
    contribute nothing (n=5 -> buckets pad to 8)."""
    args = list(_compose_args(n=5, masks="random"))
    pano1, m1 = fused_compose(*args)
    args[0] = jnp.asarray(np.round(np.asarray(args[0])).astype(np.uint8))
    out = np.zeros((pano1.shape[0], pano1.shape[1], 3), np.uint8)
    pano2, m2 = fused_compose_strips(*args, strip_w=64, out=out,
                                     out_dtype=np.uint8)
    assert pano2 is out
    assert np.array_equal(m1, m2)
    diff = np.abs(out.astype(np.float32) - pano1)[m1]
    # u8 input quantization (<=0.5 LSB) + pyramid boundary tolerance.
    assert float(np.mean(diff)) < 1.0, float(np.mean(diff))


def test_strips_grid_mosaic_geometry():
    """2-D (yaw x pitch) tile grid — the gigapixel bench geometry at toy
    scale: straddling rects in both axes, every strip a different
    subset, GAIN exposure engaged."""
    from image_stitching_tpu.ops.exposure import ExposureCompensator
    from image_stitching_tpu.config import ExposureCompensatorType as EC

    rows, cols, h, w, focal = 2, 4, 40, 56, 180.0
    n = rows * cols
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    imgs = np.stack([
        np.clip(np.stack([50 + xx + 7 * i, 60 + yy, 80 + 0.2 * xx], -1)
                + rng.uniform(-2, 2, (h, w, 3)), 0, 255)
        for i in range(n)]).astype(np.float32)
    k = np.tile(np.array([[focal, 0, w / 2], [0, focal, h / 2],
                          [0, 0, 1]], np.float32), (n, 1, 1))
    ys = (w / focal) * 0.75
    ps = (h / focal) * 0.75
    rs = np.stack([
        (R.from_euler("y", ys * (c - (cols - 1) / 2))
         * R.from_euler("x", ps * (r - (rows - 1) / 2))
         ).as_matrix().astype(np.float32)
        for r in range(rows) for c in range(cols)])
    warper = make_warper("spherical", focal)
    corners, sizes = _rois(warper, n, h, w, k, rs)
    seam_masks = [np.full((sizes[i][1], sizes[i][0]), 255, np.uint8)
                  for i in range(n)]
    comp = ExposureCompensator(
        comp_type=EC.GAIN,
        gains=np.linspace(0.8, 1.2, n).astype(np.float32),
        grid_sizes=np.ones((n, 2), np.int32))
    args = (jnp.asarray(imgs), k, rs, warper, corners, sizes,
            seam_masks, corners, 1.0, comp, BlenderType.MULTI_BAND, 5.0)
    pano1, m1 = fused_compose(*args)
    pano2, m2 = fused_compose_strips(*args, strip_w=64)
    assert np.array_equal(m1, m2)
    diff = np.abs(pano2 - pano1)[m1]
    assert float(np.mean(diff)) < 0.5, float(np.mean(diff))
    assert float(np.percentile(diff, 99)) <= 2.0


def test_strips_narrow_tiles_wide_canvas():
    """Many narrow tiles over a wide canvas (mosaic100-like geometry):
    every strip sees a different image subset."""
    args = _compose_args(n=9, h=40, w=48, focal=60.0,
                         masks="random")
    pano1, m1 = fused_compose(*args)
    pano2, m2 = fused_compose_strips(*args, strip_w=96)
    assert np.array_equal(m1, m2)
    diff = np.abs(pano2 - pano1)[m1]
    assert float(np.mean(diff)) < 0.5, float(np.mean(diff))
