"""Cross-dateline pair coupling (seams.periodic_corner).

The date-line ROI rebranch (ops/warps.py::detect_result_roi) re-centers a
view straddling azimuth +-pi on its own azimuth, so in a full-360 ring
the wrap pair's rects sit a full u-period apart while genuinely
overlapping on the sphere.  Axis-aligned rect intersection alone would
drop that pair from seam/exposure coupling (the reference's full-width
ROIs never hit this; `image_stitching.cpp:1032-1065` and `:1002-1023`
always see the pair).  `period=` re-couples it.
"""
import numpy as np
import pytest

from image_stitching_tpu.ops import exposure as exposure_mod
from image_stitching_tpu.ops import seams as seams_mod
from image_stitching_tpu.ops.seams import periodic_corner
from image_stitching_tpu.ops.warps import u_period

P = 1000
H, W = 60, 80
# A spans u 460..540; B spans -520..-440 => B + P spans 480..560:
# the pair overlaps only through the +P alias (x 480..540, 60 px wide).
CORNERS = [(460, 0), (-520, 0)]
SIZES = [(W, H), (W, H)]


def _scene(bright_a=100.0, bright_b=200.0):
    imgs = [np.full((H, W, 3), bright_a, np.float32),
            np.full((H, W, 3), bright_b, np.float32)]
    masks = [np.full((H, W), 255, np.uint8) for _ in range(2)]
    return imgs, masks


def test_periodic_corner_picks_alias():
    assert periodic_corner(CORNERS[0], SIZES[0], CORNERS[1], SIZES[1],
                           P) == (480, 0)
    # No period: corner unchanged.
    assert periodic_corner(CORNERS[0], SIZES[0], CORNERS[1], SIZES[1],
                           None) == CORNERS[1]
    # Non-straddling pair: shift never helps, corner unchanged.
    assert periodic_corner((0, 0), (100, 50), (60, 10), (100, 50),
                           P) == (60, 10)


def test_u_period_projection_set():
    assert u_period("spherical", 100.0) == round(2 * np.pi * 100.0)
    assert u_period("cylindrical", 50.0) == round(2 * np.pi * 50.0)
    assert u_period("plane", 100.0) is None
    assert u_period("fisheye", 100.0) is None


@pytest.mark.parametrize("seam_type", ["dp_color", "voronoi", "gc_color"])
def test_seams_couple_across_dateline(seam_type):
    imgs, masks = _scene()
    # Without the period the pair is invisible: masks unchanged.
    out0 = seams_mod.find_seams(imgs, CORNERS, masks, seam_type)
    assert all((m == 255).all() for m in out0)
    # With it, the aliased overlap is partitioned exclusively.
    out1 = seams_mod.find_seams(imgs, CORNERS, masks, seam_type, period=P)
    ov_a = out1[0][:, 20:] > 0   # A's local x 20.. is the overlap
    ov_b = out1[1][:, :60] > 0   # B's local x ..60
    assert (ov_a ^ ov_b).all()   # each aliased pixel owned exactly once
    if seam_type == "dp_color":
        # DP's source/sink sides come from ROI centers when the exclusive
        # regions fall outside the overlap box, so it genuinely splits;
        # voronoi/gc legitimately award such an overlap to one side
        # (identical to a non-aliased pair of the same geometry).
        assert ov_a.any() and ov_b.any()


def test_exposure_couples_across_dateline():
    imgs, masks = _scene()
    c0 = exposure_mod.feed(CORNERS, imgs, masks, comp_type="gain")
    np.testing.assert_allclose(c0.gains, 1.0, atol=1e-9)
    c1 = exposure_mod.feed(CORNERS, imgs, masks, comp_type="gain",
                           period=P)
    assert c1.gains[0] > 1.02 and c1.gains[1] < 0.98


def test_exposure_device_parity_with_period():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
            for _ in range(2)]
    masks = [np.full((H, W), 255, np.uint8) for _ in range(2)]
    host = exposure_mod.feed(CORNERS, imgs, masks,
                             comp_type="gain_blocks", block_size=32,
                             period=P)
    dev = exposure_mod.feed_device(
        CORNERS, SIZES, jnp.asarray(np.stack(imgs)),
        jnp.asarray(np.stack([m for m in masks])),
        comp_type="gain_blocks", block_size=32, period=P)
    np.testing.assert_array_equal(host.grid_sizes, dev.grid_sizes)
    np.testing.assert_allclose(dev.gains, host.gains, rtol=2e-5, atol=2e-5)
