"""Strict-sequential DP seam mode (`find_seams(..., strict=True)`).

OpenCV's `cv::detail::DpSeamFinder` recomputes each pair's overlap
components from masks EVOLVED by earlier pairs; the pipeline default
batches all DPs from the initial masks (PARITY.md known deltas).  The
strict mode replicates the sequential order for parity quantification
(`image_stitching.cpp:1032-1065` machinery; tools/seam_delta.py).
"""
import numpy as np
import pytest

from image_stitching_tpu.ops import seams


def _two_image_scene(rng):
    h, w = 48, 64
    img1 = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    corners = [(0, 0), (w // 2, 0)]
    masks = [np.full((h, w), 255, np.uint8) for _ in range(2)]
    return [img1, img2], corners, masks


def _three_image_scene(rng):
    """Three staggered rects with a genuine 3-way overlap band."""
    h, w = 48, 64
    imgs = [rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
            for _ in range(3)]
    corners = [(0, 0), (20, 6), (40, 12)]
    masks = [np.full((h, w), 255, np.uint8) for _ in range(3)]
    return imgs, corners, masks


def _ownership(masks, corners):
    x1 = max(c[0] + m.shape[1] for c, m in zip(corners, masks))
    y1 = max(c[1] + m.shape[0] for c, m in zip(corners, masks))
    owner = np.full((y1, x1), -1, np.int16)
    count = np.zeros((y1, x1), np.int16)
    for i, (c, m) in enumerate(zip(corners, masks)):
        sub = owner[c[1]:c[1] + m.shape[0], c[0]:c[0] + m.shape[1]]
        sub[m > 0] = i
        count[c[1]:c[1] + m.shape[0],
              c[0]:c[0] + m.shape[1]] += (m > 0)
    return owner, count


def test_strict_equals_batched_single_pair(rng):
    """With one pair there is no mask evolution: strict == batched
    bit-for-bit."""
    imgs, corners, masks = _two_image_scene(rng)
    a = seams.find_seams(imgs, corners, [m.copy() for m in masks],
                         "dp_color")
    b = seams.find_seams(imgs, corners, [m.copy() for m in masks],
                         "dp_color", strict=True)
    for ma, mb in zip(a, b):
        np.testing.assert_array_equal(ma, mb)


def test_strict_three_way_exclusive_and_covering(rng):
    """Strict mode must keep the OpenCV invariants: every originally
    covered pixel stays covered (no holes) and no pixel is owned twice
    after seams."""
    imgs, corners, masks = _three_image_scene(rng)
    covered0 = _ownership(masks, corners)[1] > 0
    out = seams.find_seams(imgs, corners, [m.copy() for m in masks],
                           "dp_color", strict=True)
    owner, count = _ownership(out, corners)
    assert np.array_equal(count > 0, covered0), "strict mode made a hole"
    assert count.max() == 1 or np.all(count[count > 1] == 1), \
        "pixel owned by two images after strict seams"
    assert (count <= 1).all()


def test_strict_close_to_batched_three_way(rng):
    """The two orders may differ in 3+-way regions, but must broadly
    agree (same machinery, same costs)."""
    imgs, corners, masks = _three_image_scene(rng)
    a = seams.find_seams(imgs, corners, [m.copy() for m in masks],
                         "dp_color")
    b = seams.find_seams(imgs, corners, [m.copy() for m in masks],
                         "dp_color", strict=True)
    oa, ca = _ownership(a, corners)
    ob, cb = _ownership(b, corners)
    covered = (ca > 0) | (cb > 0)
    dis = ((oa != ob) & covered).sum() / covered.sum()
    assert dis < 0.15, f"ownership disagreement {dis:.1%}"


def test_strict_rejects_unknown_type():
    with pytest.raises(ValueError):
        seams.find_seams(None, [], [], "dp_sparkle", strict=True)
