"""orb_sample_pallas (interpret mode) vs the shipped XLA sampling path.

The kernel must be an EXACT replacement for the detect-path sampling
(`ops.features.orb._orientations` + the `_describe_impl` fetch): f32
one-hot matmuls select single values, so samples are bit-identical and
moments are plain f32 reductions over the same disk.  Runs the Pallas
interpreter on CPU (tests/conftest.py forces the CPU backend)."""

import jax.numpy as jnp
import numpy as np

from image_stitching_tpu.kernels.orb_sample_pallas import (
    orb_sample_pallas, plane_admissible, win_shape)
from image_stitching_tpu.ops.features import orb


def _setup(seed=0, h=120, w=260, k=23, span_margin=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    blur = rng.uniform(0, 255, (h, w)).astype(np.float32)
    border = 22  # detect's in-bounds margin (patch//2 + 2)
    xy = np.stack([
        rng.uniform(border, w - 1 - border, k),
        rng.uniform(border, h - 1 - border, k)], -1).astype(np.float32)
    pattern = orb.resolve_pattern(None, 40)
    pat_xy = np.stack([
        np.concatenate([pattern[:, 0], pattern[:, 2]]),
        np.concatenate([pattern[:, 1], pattern[:, 3]])]).astype(np.float32)
    span = max(orb._pattern_span(pattern), 20)
    return img, blur, xy, pattern, pat_xy, span


def _oracle_samples(blur, xy, mom, pat_xy):
    """The _describe_impl fetch with the KERNEL's quotient-form
    rotation (ca = m10/|m|): rotate, round, clip GLOBALLY, read the
    image.  All f32 ops are IEEE correctly-rounded, so numpy reproduces
    the kernel arithmetic bit-for-bit."""
    h, w = blur.shape
    m10 = mom[:, 0].astype(np.float32)
    m01 = mom[:, 1].astype(np.float32)
    nrm = np.sqrt(m10 * m10 + m01 * m01, dtype=np.float32)
    safe = np.maximum(nrm, np.float32(1e-30))
    ca = np.where(nrm > 0, (m10 / safe).astype(np.float32), np.float32(1))
    sa = np.where(nrm > 0, (m01 / safe).astype(np.float32), np.float32(0))
    ca, sa = ca[:, None], sa[:, None]
    px, py = pat_xy[0][None], pat_xy[1][None]
    gx = np.clip(np.round(xy[:, 0:1] + ca * px - sa * py).astype(np.int64),
                 0, w - 1)
    gy = np.clip(np.round(xy[:, 1:2] + sa * px + ca * py).astype(np.int64),
                 0, h - 1)
    return blur[gy, gx]


def test_moments_match_orientations():
    img, blur, xy, pattern, pat_xy, span = _setup()
    samples, ang_k, mom = orb_sample_pallas(
        jnp.asarray(img), jnp.asarray(blur), jnp.asarray(xy),
        jnp.asarray(pat_xy), radius=20, span=span, interpret=True)
    angle_ref = np.asarray(orb._orientations(jnp.asarray(img),
                                             jnp.asarray(xy), 20))
    angle_kernel = np.arctan2(np.asarray(mom)[:, 1], np.asarray(mom)[:, 0])
    # Same disk, same values; the window reduction accumulates in a
    # different f32 order than _orientations' HIGHEST matmul, so the
    # match is numerical, not bitwise.
    np.testing.assert_allclose(angle_kernel, angle_ref, rtol=0, atol=1e-4)


def test_samples_exact_vs_fetch_oracle():
    img, blur, xy, pattern, pat_xy, span = _setup(seed=3)
    samples, ang_k, mom = orb_sample_pallas(
        jnp.asarray(img), jnp.asarray(blur), jnp.asarray(xy),
        jnp.asarray(pat_xy), radius=20, span=span, interpret=True)
    want = _oracle_samples(blur, xy, np.asarray(mom), pat_xy)
    np.testing.assert_array_equal(np.asarray(samples), want)


def test_descriptor_bits_match_describe_impl():
    """End-to-end: kernel bits == _describe (same blur plane, same
    angles)."""
    img, blur, xy, pattern, pat_xy, span = _setup(seed=7, h=96, w=384,
                                                  k=17)
    samples, ang_k, mom = orb_sample_pallas(
        jnp.asarray(img), jnp.asarray(blur), jnp.asarray(xy),
        jnp.asarray(pat_xy), radius=20, span=span, interpret=True)
    s = np.asarray(samples)
    bits_kernel = s[:, :256] < s[:, 256:]
    # Exact against the quotient-rotation oracle...
    want = _oracle_samples(blur, xy, np.asarray(mom), pat_xy)
    bits_want = want[:, :256] < want[:, 256:]
    np.testing.assert_array_equal(bits_kernel, bits_want)
    # ...and near-identical to _describe, whose cos(arctan2) rotation
    # can move a sample only when a rotated coordinate sits on a .5
    # rounding boundary (ulp-level difference).
    angle = jnp.arctan2(mom[:, 1], mom[:, 0])
    words_ref = np.asarray(orb._describe(jnp.asarray(blur), jnp.asarray(xy),
                                         angle, pattern))
    shifts = np.arange(32, dtype=np.uint32)
    bits_ref = ((words_ref[:, :, None] >> shifts) & 1).astype(bool)
    bits_ref = bits_ref.reshape(len(xy), 256)
    assert (bits_kernel != bits_ref).mean() < 0.01


def test_edge_keypoints_stay_in_window():
    """Keypoints hugging every border (and an invalid xy=0 slot): the
    kernel must not read out of bounds and clipped samples must match
    the oracle."""
    rng = np.random.default_rng(11)
    h, w = 72, 200
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    blur = rng.uniform(0, 255, (h, w)).astype(np.float32)
    xy = np.array([[0.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0],
                   [w - 1.0, 0.0], [22.0, 22.0], [w - 23.0, h - 23.0],
                   [w / 2, 3.0], [3.0, h / 2]], np.float32)
    pattern = orb.resolve_pattern(None, 40)
    pat_xy = np.stack([
        np.concatenate([pattern[:, 0], pattern[:, 2]]),
        np.concatenate([pattern[:, 1], pattern[:, 3]])]).astype(np.float32)
    span = max(orb._pattern_span(pattern), 20)
    samples, ang_k, mom = orb_sample_pallas(
        jnp.asarray(img), jnp.asarray(blur), jnp.asarray(xy),
        jnp.asarray(pat_xy), radius=20, span=span, interpret=True)
    want = _oracle_samples(blur, xy, np.asarray(mom), pat_xy)
    np.testing.assert_array_equal(np.asarray(samples), want)


def test_detect_integration_interpret_vs_off():
    """orb_detect_and_describe with sample_kernel='interpret' (the wired
    kernel path run by the Pallas interpreter) against the XLA path:
    identical keypoints/responses, ulp-close angles, near-identical
    descriptor bits."""
    rng = np.random.default_rng(5)
    gray = (rng.uniform(0, 1, (160, 200)).astype(np.float32) * 0 +
            np.kron(rng.uniform(0, 255, (40, 50)),
                    np.ones((4, 4))).astype(np.float32))
    gray += rng.normal(0, 4, gray.shape).astype(np.float32)
    f_off = orb.orb_detect_and_describe(gray, n_features=150, n_levels=2,
                                        sample_kernel="off")
    f_ker = orb.orb_detect_and_describe(gray, n_features=150, n_levels=2,
                                        sample_kernel="interpret")
    np.testing.assert_array_equal(np.asarray(f_off.valid),
                                  np.asarray(f_ker.valid))
    np.testing.assert_array_equal(np.asarray(f_off.xy),
                                  np.asarray(f_ker.xy))
    v = np.asarray(f_off.valid)
    a0 = np.asarray(f_off.angle)[v]
    a1 = np.asarray(f_ker.angle)[v]
    d = np.abs(a0 - a1)
    np.testing.assert_allclose(np.minimum(d, 2 * np.pi - d), 0, atol=1e-4)
    w0 = np.asarray(f_off.desc)[v]
    w1 = np.asarray(f_ker.desc)[v]
    shifts = np.arange(32, dtype=np.uint32)
    b0 = ((w0[:, :, None] >> shifts) & 1).astype(bool)
    b1 = ((w1[:, :, None] >> shifts) & 1).astype(bool)
    assert (b0 != b1).mean() < 0.01


def test_win_shape_and_admissibility():
    wh, ww = win_shape(28)
    assert wh >= 2 * 28 + 8 and wh % 8 == 0
    assert ww >= 2 * 28 + 128 and ww % 128 == 0
    assert plane_admissible(960, 1280)       # rig tile level 0
    assert not plane_admissible(2448, 3264)  # 8 MP e2e level 0
