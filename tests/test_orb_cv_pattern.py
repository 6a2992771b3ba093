"""Descriptor-level interop with OpenCV ORB via bit_pattern_31_.

The reference consumes OpenCV's learned rBRIEF table through
``ORB::create`` (`image_stitching.cpp:545`).  Our default pattern is a
self-consistent Gaussian table (pipeline-level parity); ``pattern="cv"``
switches to the numerically-decoded bit_pattern_31_
(tools/extract_orb_pattern.py) for byte-level compatibility with
reference-produced descriptors.  cv2 is the oracle (CLAUDE.md).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from image_stitching_tpu.ops.features.orb import (  # noqa: E402
    make_brief_pattern, make_cv_pattern, resolve_pattern, _describe)
from image_stitching_tpu.ops.imgproc import gaussian_blur  # noqa: E402


def _unpack(words_u32):
    """(K, 8) uint32 descriptor words -> (K, 256) bool, cv2 bit order."""
    b = np.asarray(words_u32).astype("<u4").tobytes()
    return np.unpackbits(np.frombuffer(b, np.uint8),
                         bitorder="little").reshape(-1, 256).astype(bool)


def _cv_desc(img_u8, pts, angle=0.0):
    orb = cv2.ORB_create(nfeatures=len(pts) + 8)
    kps = [cv2.KeyPoint(float(x), float(y), 31.0, float(angle))
           for x, y in pts]
    kps_out, d = orb.compute(img_u8, kps)
    assert len(kps_out) == len(pts)
    return np.unpackbits(d, axis=1, bitorder="little").astype(bool)


def test_table_sane():
    pat = make_cv_pattern()
    assert pat.shape == (256, 4)
    assert np.abs(pat).max() <= 15           # pattern lives in the 31-patch
    assert not np.any(np.all(pat[:, :2] == pat[:, 2:], axis=1))  # p1 != p2
    assert np.array_equal(resolve_pattern("cv"), pat)
    assert np.array_equal(resolve_pattern(None), make_brief_pattern(40))


def test_angle0_descriptors_match_cv2():
    """Angle-0 bits = blurred(p1) < blurred(p2): ours vs cv2 on the same
    keypoints.  Residual = +-1-LSB blur-tie flips (float blur vs cv2's
    rounded uint8), ~1% of bits — vs ~50% for an unrelated pattern."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (256, 320), dtype=np.uint8)
    xs = np.arange(48, 280, 24)
    ys = np.arange(48, 220, 24)
    pts = np.array([(x, y) for y in ys for x in xs], np.float32)

    d_cv = _cv_desc(img, pts)

    blur = gaussian_blur(np.asarray(img, np.float32), 2.0, 3)
    angles = np.zeros(len(pts), np.float32)
    d_cvpat = _unpack(_describe(blur, pts, angles,
                                make_cv_pattern()))
    ham = (d_cvpat != d_cv).sum(axis=1)
    assert ham.mean() < 8.0, f"mean Hamming {ham.mean():.2f} of 256"
    assert np.median(ham) <= 6

    d_gauss = _unpack(_describe(blur, pts, angles,
                                make_brief_pattern(40)))
    ham_g = (d_gauss != d_cv).sum(axis=1)
    assert ham_g.mean() > 96, "gauss pattern should NOT match cv2"


def test_rotated_descriptors_close():
    """Rotated sampling: cv2 rounds the rotated offset, we round
    center+offset — same grid for integer centers; remaining deltas are
    blur ties.  Interop must hold at nonzero angles too (real keypoints
    carry IC angles)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (256, 320), dtype=np.uint8)
    pts = np.array([(x, y) for y in (80, 140, 200) for x in (80, 160, 240)],
                   np.float32)
    blur = gaussian_blur(np.asarray(img, np.float32), 2.0, 3)
    for deg in (30.0, 135.0, 262.5):
        d_cv = _cv_desc(img, pts, angle=deg)
        ang = np.full(len(pts), np.deg2rad(deg), np.float32)
        ours = _unpack(_describe(blur, pts, ang, make_cv_pattern()))
        ham = (ours != d_cv).sum(axis=1)
        assert ham.mean() < 20.0, (deg, ham.mean())
