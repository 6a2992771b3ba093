"""Unit tests for imgproc, exposure, seams, blend, crop, timelapse ops."""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from image_stitching_tpu.config import (BlenderType,
                                        ExposureCompensatorType as ECT,
                                        TimelapserType)
from image_stitching_tpu.ops import exposure as exposure_mod
from image_stitching_tpu.ops import seams as seams_mod
from image_stitching_tpu.ops.blend import (FeatherBlender, MultiBandBlender,
                                           NoBlender, make_blender,
                                           num_bands_for, pyr_down, pyr_up)
from image_stitching_tpu.ops.crop import crop, crop_rect
from image_stitching_tpu.ops.imgproc import (box_blur, dilate3,
                                             gaussian_blur, resize,
                                             rgb_to_gray, scale_size)
from image_stitching_tpu.ops.timelapse import Timelapser, fixed_name


# --------------------------------------------------------------- imgproc ----
def test_resize_matches_opencv(rng):
    img = rng.uniform(0, 255, (37, 53, 3)).astype(np.float32)
    ours = np.asarray(resize(jnp.asarray(img), (61, 91)))
    ref = cv2.resize(img, (91, 61), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() < 1.0
    down = np.asarray(resize(jnp.asarray(img), (19, 27)))
    ref = cv2.resize(img, (27, 19), interpolation=cv2.INTER_LINEAR)
    assert np.abs(down - ref).mean() < 2.0


def test_resize_matches_inter_linear_exact(rng):
    """The reference resizes with INTER_LINEAR_EXACT (image_stitching.cpp:
    602,619,1144) — cv2's bit-exact fixed-point bilinear.  Our float path
    must agree to the 1-LSB fixed-point rounding tie on uint8 inputs."""
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    for out_hw in [(61, 91), (19, 27), (74, 106)]:
        ours = np.clip(np.round(np.asarray(
            resize(jnp.asarray(img, jnp.float32), out_hw))), 0, 255)
        ref = cv2.resize(img, (out_hw[1], out_hw[0]),
                         interpolation=cv2.INTER_LINEAR_EXACT)
        d = np.abs(ours - ref.astype(np.float64))
        assert d.max() <= 1.0 and d.mean() < 0.2


def test_dilate_matches_opencv(rng):
    m = (rng.uniform(size=(32, 40)) > 0.8).astype(np.uint8) * 255
    ours = np.asarray(dilate3(jnp.asarray(m)))
    ref = cv2.dilate(m, None)
    np.testing.assert_array_equal(ours, ref)


def test_rgb_to_gray_matches_opencv(rng):
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    ours = np.asarray(rgb_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    assert np.abs(ours - ref).max() <= 1.0


def test_pyr_down_up_matches_opencv(rng):
    img = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    ours = np.asarray(pyr_down(jnp.asarray(img)))
    ref = cv2.pyrDown(img)
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).mean() < 1.5  # border handling differs
    up = np.asarray(pyr_up(jnp.asarray(ours), (64, 96)))
    ref_up = cv2.pyrUp(ref)
    assert np.abs(up - ref_up).mean() < 3.0


def test_scale_size():
    assert scale_size(100, 200, 0.5) == (50, 100)
    assert scale_size(3, 3, 0.01) == (1, 1)


# -------------------------------------------------------------- exposure ----
def test_gain_identical_exposure_is_identity(rng):
    img = rng.uniform(50, 200, (64, 96, 3)).astype(np.float32)
    img1, img2 = img[:, :64], img[:, 32:]
    m = np.full((64, 64), 255, np.uint8)
    for t in (ECT.GAIN, ECT.GAIN_BLOCKS, ECT.CHANNELS, ECT.CHANNELS_BLOCKS):
        comp = exposure_mod.feed([(0, 0), (32, 0)], [img1, img2], [m, m],
                                 t, block_size=32)
        out = np.asarray(exposure_mod.apply_gain(comp, 0, (0, 0), img1))
        np.testing.assert_allclose(out, img1, rtol=1e-3, atol=0.5)


def test_gain_compensates_exposure_difference(rng):
    img = rng.uniform(50, 200, (64, 96, 3)).astype(np.float32)
    img1, img2 = img[:, :64], img[:, 32:] * 0.7
    m = np.full((64, 64), 255, np.uint8)
    comp = exposure_mod.feed([(0, 0), (32, 0)], [img1, img2], [m, m],
                             ECT.GAIN)
    g = np.asarray(comp.gains)
    assert g[1] > 1.05 and g[0] < 0.95
    # Compensated overlap means should be closer than uncompensated.
    o1 = np.asarray(exposure_mod.apply_gain(comp, 0, (0, 0), img1))
    o2 = np.asarray(exposure_mod.apply_gain(comp, 1, (32, 0), img2))
    before = abs(img1[:, 32:].mean() - img2[:, :32].mean())
    after = abs(o1[:, 32:].mean() - o2[:, :32].mean())
    assert after < before * 0.3


def test_exposure_no():
    img = np.ones((8, 8, 3), np.float32) * 99
    comp = exposure_mod.feed([(0, 0)], [img], [np.ones((8, 8), np.uint8)],
                             ECT.NO)
    out = np.asarray(exposure_mod.apply_gain(comp, 0, (0, 0), img))
    np.testing.assert_array_equal(out, img)


# ----------------------------------------------------------------- seams ----
def test_dp_seam_per_overlap_component():
    """cv::detail::DpSeamFinder processes each connected component of an
    overlap separately (`image_stitching.cpp:1032-1065`): with a 2-blob
    overlap and V-shaped per-column cost whose minimum differs per blob,
    each blob must get its OWN seam (a single bbox-level seam cannot land
    on both targets), and ownership must agree with the cv2 oracle."""
    h, w = 96, 128
    corners = [(0, 0), (48, 0)]        # overlap: global x in [48, 128)
    img1 = np.zeros((h, w, 3), np.float32) + 100
    img2 = np.zeros((h, w, 3), np.float32) + 100
    for yr, tgt in [(slice(0, 40), 20), (slice(56, 96), 58)]:
        for xl in range(80):
            img2[yr, xl, :] = 100 + 2.0 * abs(xl - tgt)
    m1 = np.full((h, w), 255, np.uint8)
    m2 = np.full((h, w), 255, np.uint8)
    m2[40:56, :80] = 0                 # split the overlap into two blobs
    out = seams_mod.find_seams([img1, img2], corners,
                               [m1.copy(), m2.copy()], "dp_color")
    o1 = out[0][:, 48:] > 0
    o2 = out[1][:, :80] > 0
    ov = (m1[:, 48:] > 0) & (m2[:, :80] > 0)
    assert not (o1 & o2 & ov).any()
    assert ((o1 | o2) | ~ov).all()
    for rows, tgt in [(slice(0, 40), 20), (slice(56, 96), 58)]:
        own1 = o1[rows]
        cols = [np.max(np.nonzero(r)[0]) for r in own1 if r.any()]
        assert abs(np.median(cols) - tgt) <= 2, (tgt, np.median(cols))
    # Ownership agreement with cv2's DpSeamFinder on the same input.
    sf = cv2.detail_DpSeamFinder("COLOR")
    res = sf.find([cv2.UMat(img1), cv2.UMat(img2)], corners,
                  [cv2.UMat(m1.copy()), cv2.UMat(m2.copy())])
    a1 = np.asarray(res[0].get())[:, 48:] > 0
    agree = ((o1 == a1) & ov).sum() / ov.sum()
    assert agree > 0.8, agree


def test_dp_seams_device_sourced_matches_host(rng):
    """find_seams with images_dev (crop content gathered on device from
    the padded warped stack) == the host-upload path, bit for bit, on
    u8-valued pixels — incl. vertical-seam (transposed) tasks."""
    import jax.numpy as jnp

    n, h, w = 3, 60, 80
    imgs, corners, masks = [], [], []
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
        imgs.append(img)
        # Mixed horizontal and vertical offsets to get both task
        # orientations.
        corners.append((i * 40, (i % 2) * 25))
        m = np.full((h, w), 255, np.uint8)
        if i == 1:
            m[20:28, 30:50] = 0   # punch a hole: multi-component overlaps
        masks.append(m)
    out_host = seams_mod.find_seams(imgs, corners,
                                    [m.copy() for m in masks], "dp_color")
    pad = jnp.asarray(np.stack(imgs).astype(np.uint8))
    out_dev = seams_mod.find_seams(imgs, corners,
                                   [m.copy() for m in masks], "dp_color",
                                   images_dev=pad)
    for a, b in zip(out_host, out_dev):
        np.testing.assert_array_equal(a, b)


def _two_overlapping(rng, dx=24):
    img1 = rng.uniform(0, 255, (48, 64, 3)).astype(np.float32)
    img2 = img1.copy()
    corners = [(0, 0), (dx, 0)]
    m = np.full((48, 64), 255, np.uint8)
    return [img1, img2], corners, [m, m.copy()]


@pytest.mark.parametrize("stype", ["dp_color", "dp_colorgrad", "voronoi",
                                   "gc_color"])
def test_seams_partition_overlap(stype, rng):
    imgs, corners, masks = _two_overlapping(rng)
    out = seams_mod.find_seams(imgs, corners, masks, stype)
    # Overlap x in [24, 64) of img1 == x in [0, 40) of img2: after seam
    # finding each overlap pixel belongs to exactly one image.
    o1 = out[0][:, 24:] > 0
    o2 = out[1][:, :40] > 0
    assert not (o1 & o2).any()
    assert (o1 | o2).all()
    # Non-overlap regions untouched.
    assert (out[0][:, :24] > 0).all()
    assert (out[1][:, 40:] > 0).all()


def test_seams_no_and_unknown(rng):
    imgs, corners, masks = _two_overlapping(rng)
    out = seams_mod.find_seams(imgs, corners, masks, "no")
    np.testing.assert_array_equal(out[0], masks[0])
    with pytest.raises(ValueError, match="Can't create"):
        seams_mod.find_seams(imgs, corners, masks, "bogus")


# ----------------------------------------------------------------- blend ----
def test_num_bands_formula():
    # canvas 1000x1000, strength 5 -> blend_width = 50 -> bands =
    # ceil(log2 50) - 1 = 5 (matches image_stitching.cpp:1183).
    nb, bw = num_bands_for((0, 0, 1000, 1000), 5.0)
    assert bw == pytest.approx(50.0)
    assert nb == 5
    nb, bw = num_bands_for((0, 0, 3, 3), 5.0)
    assert bw < 1.0


@pytest.mark.parametrize("cls", ["multiband", "feather", "no"])
def test_blender_single_image_roundtrip(cls, rng):
    img = rng.uniform(10, 245, (64, 96, 3)).astype(np.float32)
    mask = np.full((64, 96), 255, np.uint8)
    corners, sizes = [(5, -3)], [(96, 64)]
    if cls == "multiband":
        b = MultiBandBlender(corners, sizes, num_bands=3)
        tol = 1.5
    elif cls == "feather":
        b = FeatherBlender(corners, sizes, sharpness=1.0 / 10)
        tol = 1.0
    else:
        b = NoBlender(corners, sizes)
        tol = 0.0
    b.feed(jnp.asarray(img), jnp.asarray(mask), (5, -3))
    out, omask = b.blend()
    out = np.asarray(out)
    # Single image: blend must reproduce it (pyramid roundtrip tolerance).
    assert out.shape[:2] == (64, 96)
    assert np.abs(out - img).mean() <= tol
    assert np.asarray(omask).mean() > 0.95


def test_multiband_blends_seam_smoothly(rng):
    # Two constant images (100 and 150) split at x=48: multiband output
    # must transition smoothly across the seam, not step.
    h, w = 64, 96
    img1 = np.full((h, w, 3), 100, np.float32)
    img2 = np.full((h, w, 3), 150, np.float32)
    m1 = np.zeros((h, w), np.uint8)
    m1[:, :48] = 255
    m2 = np.zeros((h, w), np.uint8)
    m2[:, 48:] = 255
    b = MultiBandBlender([(0, 0), (0, 0)], [(w, h), (w, h)], num_bands=3)
    b.feed(jnp.asarray(img1), jnp.asarray(m1), (0, 0))
    b.feed(jnp.asarray(img2), jnp.asarray(m2), (0, 0))
    out, _ = b.blend()
    row = np.asarray(out)[32, :, 0]
    assert abs(row[10] - 100) < 3
    assert abs(row[90] - 150) < 3
    # Max step between adjacent pixels stays small (smooth transition).
    assert np.abs(np.diff(row)).max() < 12
    # Feather and NO for comparison complete without error.
    fb = make_blender([(0, 0), (0, 0)], [(w, h), (w, h)],
                      BlenderType.FEATHER)
    fb.feed(jnp.asarray(img1), jnp.asarray(m1), (0, 0))
    fb.feed(jnp.asarray(img2), jnp.asarray(m2), (0, 0))
    fout, _ = fb.blend()
    assert np.isfinite(np.asarray(fout)).all()


# ------------------------------------------------------------------ crop ----
def test_crop_removes_black_borders(rng):
    inner = rng.uniform(10, 255, (40, 60, 3)).astype(np.float32)
    padded = np.pad(inner, [(7, 9), (11, 13), (0, 0)])
    rect = crop_rect(padded)
    x, y, w, h = rect
    assert 9 <= x <= 13 and 5 <= y <= 9
    out = crop(padded)
    assert out.shape[0] <= 42 and out.shape[1] <= 62
    # Cropped region is essentially all-nonblack.
    gray = out.sum(-1)
    assert (gray > 0).mean() > 0.99


def test_crop_irregular_boundary():
    # Slanted panorama-like mask: crop must find an interior rect.
    img = np.zeros((60, 100, 3), np.float32)
    for y in range(10, 50):
        x0 = 5 + (y - 10) // 4
        img[y, x0:x0 + 70] = 128.0
    out = crop(img)
    gray = out.sum(-1)
    assert (gray > 0).mean() > 0.98
    assert out.shape[0] > 10 and out.shape[1] > 30


def test_config_coerces_enum_strings():
    """StitchConfig must accept the enum VALUES as plain strings: a string
    blend type silently bypassed the fused compose path, and a string
    exposure type degraded *_BLOCKS to plain GAIN (regression)."""
    from image_stitching_tpu.config import StitchConfig, WaveCorrectKind
    cfg = StitchConfig(blend_type="feather",
                       expos_comp_type="channels_blocks",
                       timelapse_type="as_is", wave_correct="vert")
    assert cfg.blend_type is BlenderType.FEATHER
    assert cfg.expos_comp_type is ECT.CHANNELS_BLOCKS
    assert cfg.timelapse_type is TimelapserType.AS_IS
    assert cfg.wave_correct is WaveCorrectKind.VERT
    with pytest.raises(ValueError):
        StitchConfig(blend_type="bogus")


def test_exposure_feed_device_matches_host(rng):
    """feed_device (stats segment-summed on device from the padded warped
    stacks) == host feed for every compensator type; u8-integer channel
    sums are exact in f32, the GAIN L2-norm intensity lands ~1e-6."""
    import jax.numpy as jnp

    n, hp, wp = 4, 200, 260
    sizes = [(240, 180), (250, 190), (240, 180), (260, 200)]
    corners = [(0, 0), (120, 30), (260, 0), (350, 40)]
    imgs, msks = [], []
    stack = np.zeros((n, hp, wp, 3), np.uint8)
    mstack = np.zeros((n, hp, wp), np.uint8)
    for i, (w, h) in enumerate(sizes):
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        m = np.full((h, w), 255, np.uint8)
        m[:10, :20] = 0
        imgs.append(img.astype(np.float32))
        msks.append(m)
        stack[i, :h, :w] = img
        mstack[i, :h, :w] = m
    for ct in (ECT.GAIN, ECT.CHANNELS, ECT.GAIN_BLOCKS,
               ECT.CHANNELS_BLOCKS):
        host = exposure_mod.feed(corners, imgs, msks, comp_type=ct)
        dev = exposure_mod.feed_device(corners, sizes, jnp.asarray(stack),
                                       jnp.asarray(mstack), comp_type=ct)
        np.testing.assert_allclose(np.asarray(dev.gains, np.float64),
                                   np.asarray(host.gains, np.float64),
                                   atol=1e-4)
        np.testing.assert_array_equal(dev.grid_sizes, host.grid_sizes)


def test_fused_feather_matches_loop_blender():
    """The exact-feather fused compose == the loop path (warper.warp per
    image + FeatherBlender EDT weights), incl. a nontrivial seam mask.
    This is the parity behind routing BASELINE config 1 (VGA pair,
    feather) through the single-download fused path."""
    from scipy.spatial.transform import Rotation as R
    from image_stitching_tpu.ops.blend import num_bands_for, result_roi
    from image_stitching_tpu.ops.warps import make_warper
    from image_stitching_tpu.pipeline.compose_fused import fused_compose

    n, h, w, focal = 3, 48, 64, 40.0
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    imgs = np.stack([np.stack([60 + xx + 25 * i, 80 + yy, 90 + 0 * xx], -1)
                     for i in range(n)]).astype(np.float32)
    ks = np.tile(np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                          np.float32), (n, 1, 1))
    rs = np.stack([R.from_euler("y", 0.5 * i).as_matrix().astype(np.float32)
                   for i in range(n)])
    warper = make_warper("spherical", focal)
    corners, sizes = [], []
    for i in range(n):
        x, y, ww, hh = warper.warp_roi((h, w), ks[i], rs[i])
        corners.append((x, y))
        sizes.append((ww, hh))
    seam_masks = []
    for i in range(n):
        m = np.full((sizes[i][1], sizes[i][0]), 255, np.uint8)
        if i == 1:
            m[:, m.shape[1] // 2:] = 0   # surrendered right half
        seam_masks.append(m)

    pano_f, mask_f = fused_compose(
        jnp.asarray(imgs), ks, rs, warper, corners, sizes, seam_masks,
        corners, 1.0, None, BlenderType.FEATHER, 5.0)

    _, blend_width = num_bands_for(result_roi(corners, sizes), 5.0)
    blender = FeatherBlender(corners, sizes, 1.0 / blend_width)
    for i in range(n):
        dst_roi = (corners[i][0], corners[i][1], sizes[i][0], sizes[i][1])
        _, img_w = warper.warp(jnp.asarray(imgs[i]), ks[i], rs[i],
                               dst_roi=dst_roi)
        full = np.full((h, w), 255, np.uint8)
        _, mask_w = warper.warp(jnp.asarray(full), ks[i], rs[i],
                                interp="nearest", border="constant",
                                dst_roi=dst_roi)
        seam_m = dilate3(jnp.asarray(seam_masks[i]))
        final = (np.asarray(seam_m) > 127) & (np.asarray(mask_w) > 0)
        blender.feed(img_w, jnp.asarray(final), corners[i])
    pano_l, mask_l = blender.blend()
    pano_l = np.clip(np.asarray(pano_l), 0, 255)

    assert pano_f.shape == pano_l.shape
    both = mask_f & np.asarray(mask_l)
    assert both.mean() > 0.3
    diff = np.abs(pano_f - pano_l)[both]
    assert float(np.mean(diff)) < 0.5, float(np.mean(diff))
    assert float(np.percentile(diff, 99)) <= 1.5, (
        float(np.percentile(diff, 99)))
    assert float(diff.max()) <= 4.0, float(diff.max())


# ------------------------------------------------------------- timelapse ----
def test_timelapser(rng):
    img = rng.uniform(0, 255, (20, 30, 3)).astype(np.float32)
    corners = [(0, 0), (10, 5)]
    sizes = [(30, 20), (30, 20)]
    tl = Timelapser(corners, sizes, TimelapserType.AS_IS)
    frame = np.asarray(tl.process(jnp.asarray(img), None, (0, 0)))
    assert frame.shape == (25, 40, 3)
    np.testing.assert_allclose(frame[:20, :30], img, atol=1e-4)
    assert (frame[20:] == 0).all()
    crop_tl = Timelapser(corners, sizes, TimelapserType.CROP)
    f2 = np.asarray(crop_tl.process(jnp.asarray(img), None, (10, 5)))
    assert f2.shape == (15, 20, 3)
    assert fixed_name("/a/b/7.jpg") == "fixed_7.jpg"


def test_gain_and_channels_match_opencv(rng):
    """GAIN / CHANNELS gains == cv2.detail compensators (decoded system:
    vec-norm intensity, self-count in the beta prior, 2x alpha terms)."""
    img = rng.uniform(40, 210, (64, 96, 3)).astype(np.float32)
    u1 = img[:, :64].astype(np.uint8)
    u2 = (img[:, 32:] * 0.72).astype(np.uint8)
    m = np.full((64, 64), 255, np.uint8)
    mu = cv2.UMat(m)
    corners = [(0, 0), (32, 0)]
    fl = [u1.astype(np.float32), u2.astype(np.float32)]

    c = cv2.detail.GainCompensator(1)
    c.feed(corners, [cv2.UMat(u1), cv2.UMat(u2)], [mu, mu])
    want = np.array([np.asarray(x).ravel()[0] for x in c.getMatGains()])
    got = np.asarray(exposure_mod.feed(corners, fl, [m, m], ECT.GAIN).gains)
    np.testing.assert_allclose(got, want, atol=2e-4)

    c = cv2.detail.ChannelsCompensator(1)
    c.feed(corners, [cv2.UMat(u1), cv2.UMat(u2)], [mu, mu])
    want = np.stack([np.asarray(x).ravel()[:3] for x in c.getMatGains()])
    got = np.asarray(
        exposure_mod.feed(corners, fl, [m, m], ECT.CHANNELS).gains)
    np.testing.assert_allclose(got, want, atol=2e-4)

def test_blocks_exposure_matches_opencv_exactly(rng):
    """*_BLOCKS applied output == cv2.detail.Blocks*Compensator: per-image
    block grids, blocks-as-images global LS system, sepFilter2D x2
    REFLECT_101 smoothing, resize-stretch apply (`image_stitching.cpp:
    73-76, :1002-1023` configure exactly this machinery)."""
    h, w = 100, 140
    img1 = rng.uniform(20, 230, (h, w, 3)).astype(np.float32)
    img2 = np.clip(img1 * 0.75 + 10, 0, 255).astype(np.float32)
    u1, u2 = img1.astype(np.uint8), img2.astype(np.uint8)
    fl = [u1.astype(np.float32), u2.astype(np.float32)]
    corners = [(0, 0), (60, 13)]
    # Irregular masks exercise the countNonZero >= 1 floor for block pairs
    # whose rects intersect outside the valid region.
    m1 = np.full((h, w), 255, np.uint8)
    m1[:15, :25] = 0
    m2 = np.full((h, w), 255, np.uint8)
    m2[-20:, -30:] = 0
    mu1, mu2 = cv2.UMat(m1), cv2.UMat(m2)

    cases = [(cv2.detail.BlocksGainCompensator(32, 32, 1),
              ECT.GAIN_BLOCKS),
             (cv2.detail.BlocksChannelsCompensator(32, 32, 1),
              ECT.CHANNELS_BLOCKS)]
    for cvc, ect in cases:
        cvc.setNrGainsFilteringIterations(2)
        cvc.feed(corners, [cv2.UMat(u1), cv2.UMat(u2)], [mu1, mu2])
        comp = exposure_mod.feed(corners, fl, [m1, m2], ect,
                                 block_size=32, nr_filtering=2)
        for idx, (u, mu) in enumerate([(u1, mu1), (u2, mu2)]):
            out_cv = np.asarray(
                cvc.apply(idx, corners[idx], cv2.UMat(u), mu).get())
            out_my = np.clip(np.round(np.asarray(
                exposure_mod.apply_gain(comp, idx, corners[idx],
                                        fl[idx]))), 0, 255)
            mad = np.abs(out_cv.astype(np.float32) - out_my).mean()
            assert mad < 0.01, (ect, idx, mad)
