"""Tests for the feature detector families and the matcher.

Golden strategy (SURVEY.md section 4b): self-consistency under known
transforms, plus confidence-regime agreement with OpenCV's ORB pipeline.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_stitching_tpu.ops.features import Features, orb_detect_and_describe
from image_stitching_tpu.ops.features.akaze import akaze_detect_and_describe
from image_stitching_tpu.ops.features.sift import sift_detect_and_describe
from image_stitching_tpu.ops.features.surf import surf_detect_and_describe
from image_stitching_tpu.ops.matching import (hamming_matrix, l2_matrix,
                                              match_all_pairs, match_pair)
from image_stitching_tpu.ops.ransac import (apply_h, ransac_affine_partial,
                                            ransac_homography)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (40, 52)).astype(np.float32)
    img1 = cv2.resize(base, (256, 192), interpolation=cv2.INTER_CUBIC)
    h_true = np.float32([[0.98, 0.03, 18.0], [-0.02, 1.01, 6.0],
                         [1e-5, -1e-5, 1.0]])
    img2 = cv2.warpPerspective(img1, h_true, (256, 192))
    return img1, img2, h_true


DETECTORS = {
    "orb": orb_detect_and_describe,
    "sift": sift_detect_and_describe,
    "surf": surf_detect_and_describe,
    "akaze": akaze_detect_and_describe,
}


@pytest.mark.parametrize("name", list(DETECTORS))
def test_detector_basics(name, scene):
    img1, _, _ = scene
    f = DETECTORS[name](img1, n_features=300)
    n = int(f.count())
    assert n > 50, n
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 256).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 192).all()
    assert f.xy.shape[0] == 300  # static slots


@pytest.mark.parametrize("name", list(DETECTORS))
def test_match_recovers_homography(name, scene):
    img1, img2, h_true = scene
    det = DETECTORS[name]
    f1 = det(img1, n_features=300)
    f2 = det(img2, n_features=300)
    pm = match_pair(f1, f2, jax.random.PRNGKey(0), match_conf=0.3,
                    n_hyp=256)
    n_inl = int(pm.num_inliers)
    assert n_inl >= 12, n_inl
    pts = np.float32([[40, 40], [200, 40], [40, 150], [200, 150]])
    proj_t = np.asarray(apply_h(jnp.asarray(h_true), jnp.asarray(pts)))
    proj_e = np.asarray(apply_h(pm.h, jnp.asarray(pts)))
    assert np.abs(proj_t - proj_e).max() < 3.0
    # Usable confidence regime: the pipeline keeps pairs with
    # conf > conf_thresh (default 1.0, image_stitching.cpp:213); every
    # detector family must clear it on an adjacent overlapping pair
    # (quality table: tools/detector_quality.py).
    assert float(pm.confidence) > 1.0, float(pm.confidence)


def test_hamming_matrix_exact(rng):
    a = rng.integers(0, 2 ** 32, (16, 8), dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, (12, 8), dtype=np.uint32)
    ours = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    bits_a = np.unpackbits(a.view(np.uint8), axis=1)
    bits_b = np.unpackbits(b.view(np.uint8), axis=1)
    ref = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(ours, ref)


def test_l2_matrix_exact(rng):
    # Squared L2: cv2's float-descriptor matcher (FLANN KNN) ratio-tests
    # squared distances, so ours must be squared for match_conf parity.
    a = rng.normal(size=(10, 32)).astype(np.float32)
    b = rng.normal(size=(7, 32)).astype(np.float32)
    ours = np.asarray(l2_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.norm(a[:, None] - b[None], axis=-1) ** 2
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_ransac_homography_known_transform(rng):
    h_true = np.float32([[1.1, 0.05, 10], [-0.04, 0.95, -6],
                         [2e-5, 1e-5, 1]])
    src = rng.uniform(0, 300, (200, 2)).astype(np.float32)
    dst = np.asarray(apply_h(jnp.asarray(h_true), jnp.asarray(src)))
    dst = dst + rng.normal(0, 0.3, dst.shape).astype(np.float32)
    # 30% outliers.
    out_idx = rng.choice(200, 60, replace=False)
    dst[out_idx] += rng.uniform(30, 90, (60, 2)).astype(np.float32)
    valid = np.ones(200, bool)
    h, mask, n = ransac_homography(jnp.asarray(src), jnp.asarray(dst),
                                   jnp.asarray(valid),
                                   jax.random.PRNGKey(1))
    assert int(n) > 120
    inl = np.asarray(mask)
    assert inl[out_idx].sum() <= 3
    pts = rng.uniform(0, 300, (20, 2)).astype(np.float32)
    err = np.abs(np.asarray(apply_h(h, jnp.asarray(pts))) -
                 np.asarray(apply_h(jnp.asarray(h_true), jnp.asarray(pts))))
    assert err.max() < 1.5


def test_ransac_respects_validity_mask(rng):
    src = rng.uniform(0, 100, (50, 2)).astype(np.float32)
    dst = src + 5.0
    valid = np.zeros(50, bool)
    valid[:20] = True
    h, mask, n = ransac_homography(jnp.asarray(src), jnp.asarray(dst),
                                   jnp.asarray(valid),
                                   jax.random.PRNGKey(0))
    assert not np.asarray(mask)[20:].any()
    assert int(n) <= 20


def test_sample_valid_distinct(rng):
    from image_stitching_tpu.ops.ransac import _sample_valid_distinct

    valid = np.zeros(64, bool)
    valid[10:30] = True  # 20 valid slots
    idx = np.asarray(_sample_valid_distinct(
        jax.random.PRNGKey(3), jnp.asarray(valid), 256, 4))
    assert idx.shape == (256, 4)
    # Every pick lands on a valid slot.
    assert valid[idx].all()
    # Distinct within each row (the point of the sampler).
    for row in idx:
        assert len(set(row.tolist())) == 4
    # Uniform-ish coverage of the valid slots.
    assert len(set(idx.ravel().tolist())) == 20
    # Degenerate n_valid < k: stays in-range, duplicates allowed.
    valid2 = np.zeros(64, bool)
    valid2[5:7] = True
    idx2 = np.asarray(_sample_valid_distinct(
        jax.random.PRNGKey(4), jnp.asarray(valid2), 32, 4))
    assert valid2[idx2].all()


def test_ransac_affine_partial(rng):
    ang = 0.3
    s = 1.2
    h_true = np.float32([[s * np.cos(ang), -s * np.sin(ang), 12],
                         [s * np.sin(ang), s * np.cos(ang), -4],
                         [0, 0, 1]])
    src = rng.uniform(0, 200, (100, 2)).astype(np.float32)
    dst = np.asarray(apply_h(jnp.asarray(h_true), jnp.asarray(src)))
    h, mask, n = ransac_affine_partial(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(100, bool),
        jax.random.PRNGKey(0))
    assert int(n) > 90
    np.testing.assert_allclose(np.asarray(h), h_true, atol=0.05)


def test_match_all_pairs_symmetry(scene):
    img1, img2, _ = scene
    f1 = orb_detect_and_describe(img1, n_features=200)
    f2 = orb_detect_and_describe(img2, n_features=200)
    feats = Features.stack([f1, f2])
    pm = match_all_pairs(feats, jax.random.PRNGKey(0), match_conf=0.3,
                         n_hyp=128)
    conf = np.asarray(pm.confidence)
    assert conf.shape == (2, 2)
    assert conf[0, 0] == 0.0
    assert conf[0, 1] == pytest.approx(conf[1, 0], abs=1e-5)
    # Mirrored H is the inverse.
    h01 = np.asarray(pm.h)[0, 1]
    h10 = np.asarray(pm.h)[1, 0]
    prod = h01 @ h10
    prod /= prod[2, 2]
    np.testing.assert_allclose(prod, np.eye(3), atol=0.15)


def test_match_all_pairs_degenerate_pair_finite(rng):
    """A pair with no usable matches (conf 0 / singular H) must mirror to
    a finite identity H, not an inverted near-singular fudge
    (round-2 VERDICT weak #5)."""
    img1 = rng.uniform(0, 255, (192, 256)).astype(np.float32)
    flat = np.zeros((192, 256), np.float32)  # featureless: no matches
    f1 = orb_detect_and_describe(img1, n_features=100)
    f2 = orb_detect_and_describe(flat, n_features=100)
    feats = Features.stack([f1, f2])
    pm = match_all_pairs(feats, jax.random.PRNGKey(0), match_conf=0.3,
                         n_hyp=64)
    h = np.asarray(pm.h)
    assert np.all(np.isfinite(h)), h
    conf = np.asarray(pm.confidence)
    assert conf[0, 1] == 0.0 and conf[1, 0] == 0.0
    # Degenerate mirrored entries are exactly identity.
    np.testing.assert_array_equal(h[1, 0], np.eye(3, dtype=h.dtype))


def test_graph_cut_assembly_vectorized_speed():
    """GC on a 512x512 overlap (~0.5M edges): array-sliced assembly (no
    per-edge Python loop, round-2 VERDICT weak #3) AND a real min-cut.
    Also guards the int32 capacity fix: the old 1<<40 terminal capacity
    wrapped to 0 inside scipy's max-flow, yielding zero flow and an
    all-ones partition."""
    import time
    from image_stitching_tpu.ops.seams import _graph_cut_pair
    rng_l = np.random.default_rng(3)
    # Natural-like cost: unit base + noise, with a cheap valley band where
    # the optimal seam must run.
    cost = np.ones((512, 512), np.float32)
    cost += 0.3 * rng_l.standard_normal((512, 512)).astype(np.float32)
    cost = np.clip(cost, 0.05, None)
    cost[:, 300:310] *= 0.02
    valid = np.ones((512, 512), bool)
    must1 = np.zeros_like(valid)
    must2 = np.zeros_like(valid)
    must1[:, 0] = True
    must2[:, -1] = True
    t0 = time.perf_counter()
    keep1 = _graph_cut_pair(cost, must1, must2, valid)
    dt = time.perf_counter() - t0
    assert keep1[:, 0].all() and not keep1[:, -1].any()
    # The cut must run through the cheap valley, row by row.
    first_not1 = np.argmax(~keep1, axis=1)
    assert np.all((first_not1 >= 295) & (first_not1 <= 315))
    # Pre-fix the per-edge assembly loop alone took >30s at this size.
    assert dt < 20.0, dt


def test_match_all_pairs_range_width(scene):
    img1, img2, _ = scene
    f = orb_detect_and_describe(img1, n_features=100)
    feats = Features.stack([f, f, f])
    pm = match_all_pairs(feats, jax.random.PRNGKey(0), range_width=2)
    conf = np.asarray(pm.confidence)
    # |i - j| >= 2 pairs are masked out.
    assert conf[0, 2] == 0.0 and conf[2, 0] == 0.0


def test_match_graph_pair_cap_and_subset(scene):
    """MatchGraph semantics: pair_cap compacts valid matches losslessly up
    to the cap (dense scalars identical either way), subset() rewrites the
    pair list like myLeaveBiggestComponent (`image_stitching.cpp:251-262`)."""
    img1, img2, _ = scene
    f1 = orb_detect_and_describe(img1, n_features=200)
    f2 = orb_detect_and_describe(img2, n_features=200)
    feats = Features.stack([f1, f2, f1])
    key = jax.random.PRNGKey(0)
    full = jax.tree.map(np.asarray,
                        match_all_pairs(feats, key, match_conf=0.3,
                                        n_hyp=128))
    capped = jax.tree.map(np.asarray,
                          match_all_pairs(feats, key, match_conf=0.3,
                                          n_hyp=128, pair_cap=64))
    # Dense per-pair scalars are cap-invariant.
    np.testing.assert_array_equal(capped.confidence, full.confidence)
    np.testing.assert_array_equal(capped.num_matches, full.num_matches)
    np.testing.assert_array_equal(capped.h, full.h)
    assert capped.a_idx.shape[1] == 64
    # Capped valid slots = the first min(valid, 64) valid slots, in order.
    for p in range(len(full.ii)):
        rows_full = np.nonzero(full.valid[p])[0][:64]
        rows_cap = np.nonzero(capped.valid[p])[0]
        np.testing.assert_array_equal(capped.a_idx[p][rows_cap],
                                      full.a_idx[p][rows_full])
        np.testing.assert_array_equal(capped.b_idx[p][rows_cap],
                                      full.b_idx[p][rows_full])
    # subset([0, 2]) keeps only the (0, 2) pair, remapped to (0, 1).
    sub = full.subset([0, 2])
    np.testing.assert_array_equal(sub.ii, [0])
    np.testing.assert_array_equal(sub.jj, [1])
    np.testing.assert_array_equal(
        sub.confidence, full.confidence[np.ix_([0, 2], [0, 2])])
    row_02 = int(np.nonzero((full.ii == 0) & (full.jj == 2))[0][0])
    np.testing.assert_array_equal(sub.valid[0], full.valid[row_02])
