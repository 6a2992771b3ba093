"""Golden tests of the rotation warpers against cv2.PyRotationWarper.

OpenCV (available in the test env only) is the oracle since the reference's
behavior *is* cv::detail warping (`image_stitching.cpp:919-989`).
"""

import cv2
import numpy as np
import pytest

from image_stitching_tpu.ops import warps

K = np.array([[120.0, 0, 64], [0, 120, 48], [0, 0, 1]], np.float32)
SCALE = 100.0

ALL_NAMES = list(warps.PROJECTIONS)


def rotations():
    return [
        cv2.Rodrigues(np.float32(rv))[0].astype(np.float32)
        for rv in ([0.1, 0.3, 0.05], [0.0, 0.0, 0.0], [-0.4, 0.8, 0.2])
    ]


@pytest.mark.parametrize("name", ALL_NAMES)
def test_roi_and_point_parity(name):
    cvw = cv2.PyRotationWarper(name, SCALE)
    myw = warps.make_warper(name, SCALE)
    for R in rotations():
        roi_cv = cvw.warpRoi((128, 96), K, R)
        roi_my = myw.warp_roi((96, 128), K, R)
        # +-1 on each component: the int() truncation flips when the f32
        # extreme lands within one ulp of an integer (fma reassociation).
        assert all(abs(a - b) <= 1 for a, b in zip(roi_cv, roi_my)), (
            name, roi_cv, roi_my)
        pt_cv = cvw.warpPoint((10.0, 20.0), K, R)
        u, v = myw.warp_point(np.float32([10.0, 20.0]), K, R)
        np.testing.assert_allclose([float(u), float(v)], pt_cv, atol=1e-2)


@pytest.mark.parametrize("name", ["spherical", "cylindrical", "plane",
                                  "fisheye", "mercator", "affine"])
def test_warp_pixel_parity(name, rng):
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    R = rotations()[0]
    cvw = cv2.PyRotationWarper(name, SCALE)
    myw = warps.make_warper(name, SCALE)
    c_cv, o_cv = cvw.warp(img, K, R, cv2.INTER_LINEAR, cv2.BORDER_REFLECT)
    c_my, o_my = myw.warp(img, K, R)
    assert tuple(c_cv) == tuple(c_my)
    assert o_cv.shape[:2] == np.asarray(o_my).shape[:2]
    diff = np.abs(np.asarray(o_my).astype(np.float32) -
                  o_cv.astype(np.float32))
    # cv2 emits rounded uint8; we keep float.  Mean |diff| ~0.25 = rounding.
    assert diff.mean() < 0.6
    assert np.percentile(diff, 95) <= 1.0


def test_mask_warp_nearest_constant(rng):
    R = rotations()[0]
    mask = np.full((96, 128), 255, np.uint8)
    cvw = cv2.PyRotationWarper("spherical", SCALE)
    myw = warps.make_warper("spherical", SCALE)
    _, o_cv = cvw.warp(mask, K, R, cv2.INTER_NEAREST, cv2.BORDER_CONSTANT)
    _, o_my = myw.warp(mask, K, R, interp="nearest", border="constant")
    o_my = np.asarray(o_my).astype(np.uint8)
    assert o_cv.shape == o_my.shape
    # Valid-region agreement > 99.5% (subpixel rounding at boundary).
    agree = (o_cv == o_my).mean()
    assert agree > 0.995


def test_spherical_pole_inside_image():
    # Camera pitched 90deg up: the pole projects inside -> ROI must span to
    # the v extremes like SphericalWarper::detectResultRoi's pole fix.
    for sign in (-1.0, 1.0):
        R = cv2.Rodrigues(np.float32([sign * np.pi / 2, 0, 0]))[0].astype(
            np.float32)
        cvw = cv2.PyRotationWarper("spherical", SCALE)
        myw = warps.make_warper("spherical", SCALE)
        roi_cv = cvw.warpRoi((128, 96), K, R)
        roi_my = myw.warp_roi((96, 128), K, R)
        assert all(abs(a - b) <= 1 for a, b in zip(roi_cv, roi_my)), (
            sign, roi_cv, roi_my)


def test_unknown_warper_raises():
    with pytest.raises(ValueError, match="Can't create"):
        warps.make_warper("nope", 1.0)


def test_result_roi():
    corners = [(-5, 2), (10, -3)]
    sizes = [(20, 10), (5, 30)]
    assert warps.result_roi(corners, sizes) == (-5, -3, 20, 30)
    assert warps.result_roi_intersection(corners, sizes) == (10, 2, 5, 10)


def test_warp_backward_coords_consistency():
    # backward(forward(x)) == x within tolerance for sample interior points.
    myw = warps.make_warper("spherical", SCALE)
    R = rotations()[2]
    roi = myw.warp_roi((96, 128), K, R)
    sx, sy, valid = myw.warp_backward_coords(roi, K, R)
    sx, sy, valid = map(np.asarray, (sx, sy, valid))
    # Pick valid dest pixels, map their source coords forward again.
    ys, xs = np.nonzero(valid & (sx >= 0) & (sx < 128) & (sy >= 0) & (sy < 96))
    pick = slice(0, len(ys), max(1, len(ys) // 64))
    pts = np.stack([sx[ys[pick], xs[pick]], sy[ys[pick], xs[pick]]], -1)
    u, v = myw.warp_point(pts.astype(np.float32), K, R)
    np.testing.assert_allclose(np.asarray(u), roi[0] + xs[pick], atol=0.05)
    np.testing.assert_allclose(np.asarray(v), roi[1] + ys[pick], atol=0.05)
