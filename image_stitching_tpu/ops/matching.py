"""Pairwise feature matching on the MXU.

Replaces cv::detail::BestOf2NearestMatcher / AffineBestOf2Nearest /
BestOf2NearestRange (`image_stitching.cpp:643-655`):

  * Hamming distance over 256-bit descriptors as ONE f32 matmul on the MXU
    plus rank-1 popcount terms: d(a, b) = pop(a) + pop(b) - 2 * <bits_a,
    bits_b>.  Bit-plane tensors are (K, 256); the whole K x K distance
    matrix never leaves the device.
  * 2-NN ratio test both directions with duplicate suppression, matching
    BestOf2NearestMatcher::match semantics (ratio `1 - match_conf`).
  * RANSAC homography / similarity per pair (ops.ransac), inlier counting,
    and the reference's confidence formula
    ``conf = n_inliers / (8 + 0.3 * n_matches)`` with the `conf > 3 -> 0`
    near-duplicate suppression.
  * Everything vmaps over the O(N^2) pair axis — the N-image match stage is
    a single device computation (SURVEY.md section 2c data-parallel plan).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .features.types import Features
from .ransac import ransac_homography, ransac_affine_partial

__all__ = ["PairMatches", "match_pair", "match_all_pairs",
           "register_pair", "hamming_matrix"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PairMatches:
    """Static-shaped analogue of cv::detail::MatchesInfo.

    a_idx, b_idx: (..., M) int32 feature indices; valid: (..., M) bool;
    inlier: (..., M) bool; h: (..., 3, 3); num_inliers, confidence: (...,).
    """

    a_idx: Any
    b_idx: Any
    valid: Any
    inlier: Any
    h: Any
    num_inliers: Any
    confidence: Any

    def tree_flatten(self):
        return ((self.a_idx, self.b_idx, self.valid, self.inlier, self.h,
                 self.num_inliers, self.confidence), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __getitem__(self, idx) -> "PairMatches":
        return jax.tree.map(lambda x: x[idx], self)


def _popcount(words: jnp.ndarray) -> jnp.ndarray:
    """Bit count over the last (word) axis: (..., W) uint32 -> (...,)."""
    return jnp.sum(jax.lax.population_count(words), axis=-1).astype(jnp.int32)


def _unpack_bits(words: jnp.ndarray) -> jnp.ndarray:
    """(K, W) uint32 -> (K, W*32) float32 in {0, 1} (bit-plane tensor)."""
    k, w = words.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(k, w * 32).astype(jnp.float32)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(Ka, W) x (Kb, W) uint32 -> (Ka, Kb) int32 Hamming distances.

    MXU formulation: common_ones = bits_a @ bits_b^T; then
    d = pop_a + pop_b - 2 * common.  bf16 is exact for counts < 257.
    """
    pa = _popcount(desc_a)
    pb = _popcount(desc_b)
    ba = _unpack_bits(desc_a).astype(jnp.bfloat16)
    bb = _unpack_bits(desc_b).astype(jnp.bfloat16)
    common = jax.lax.dot_general(
        ba, bb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (pa[:, None] + pb[None, :] - 2.0 * common).astype(jnp.int32)


def l2_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(Ka, D) x (Kb, D) float -> (Ka, Kb) SQUARED L2 distances.

    Squared on purpose: cv::detail::BestOf2NearestMatcher runs FLANN KNN
    for CV_32F descriptors, which reports squared L2, and applies the
    `d1 < (1 - match_conf) * d2` ratio test on those squared values — so
    the reference's SIFT/SURF default match_conf 0.65
    (`image_stitching.cpp:59`) is calibrated to squared distances.  A
    true-L2 ratio test at 0.65 (d1 < 0.35 d2) is quadratically stricter
    and drops every pair on the synthetic captures."""
    a = desc_a.astype(jnp.float32)
    b = desc_b.astype(jnp.float32)
    dots = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    na = jnp.sum(a * a, axis=1)
    nb = jnp.sum(b * b, axis=1)
    return jnp.maximum(na[:, None] + nb[None, :] - 2 * dots, 0.0)


def _two_nn(dist: jnp.ndarray, valid_b: jnp.ndarray):
    """Per row: indices+distances of the 2 nearest valid columns.

    Two-pass min reductions instead of `lax.top_k` — top_k lowers to a
    partial sort on TPU, which is the slow part of a vmapped K x K match;
    min/argmin are plain row reductions that XLA fuses with the distance
    matmul epilogue."""
    big = jnp.float32(2 ** 30)
    masked = jnp.where(valid_b[None, :], dist, big)
    i1 = jnp.argmin(masked, axis=1).astype(jnp.int32)
    d1 = jnp.min(masked, axis=1)
    cols = jnp.arange(masked.shape[1], dtype=jnp.int32)
    masked2 = jnp.where(cols[None, :] == i1[:, None], big, masked)
    i2 = jnp.argmin(masked2, axis=1).astype(jnp.int32)
    d2 = jnp.min(masked2, axis=1)
    return i1, d1, i2, d2


def _two_nn_hamming(desc_a, desc_b, valid_b):
    """2-NN over binary descriptors via the XLA bit-plane matmul.

    An experimental fused Pallas kernel lives in kernels.hamming_pallas;
    honest fresh-input benchmarks on v5e put XLA far ahead (0.26ms vs 73ms
    at K=4096: XLA streams the 64MB distance matrix at HBM speed while the
    kernel's serial B-tile loop defeats DMA pipelining), so the XLA path
    is the production one.  match_pair computes the matrix once and reads
    its transpose for the reverse direction; this helper remains the
    single-direction entry (kernels A/B tooling).  Beware: the axon
    runtime memoizes executions on identical input buffers — benchmark
    kernels with fresh inputs.
    """
    return _two_nn(hamming_matrix(desc_a, desc_b).astype(jnp.float32),
                   valid_b)


@functools.partial(jax.jit, static_argnames=("matcher_type", "n_hyp"))
def match_pair(feat_a: Features, feat_b: Features, key: jnp.ndarray,
               match_conf: float = 0.32, matcher_type: str = "homography",
               n_hyp: int = 512) -> PairMatches:
    """BestOf2NearestMatcher::match for one (a, b) pair, fully on device.

    Returns 2K match slots (K forward + K reverse, masked).
    """
    ka = feat_a.max_features
    kb = feat_b.max_features
    if jnp.issubdtype(feat_a.desc.dtype, jnp.floating):
        dist = l2_matrix(feat_a.desc, feat_b.desc)
    else:
        # One bit-plane matmul serves BOTH directions (the reverse 2-NN
        # reads the transpose) — half the matmul FLOPs and half the peak
        # (K, K)-per-pair memory of computing hamming(b, a) separately.
        dist = hamming_matrix(feat_a.desc, feat_b.desc).astype(jnp.float32)
    b1, d1, _, d2 = _two_nn(dist, feat_b.valid)
    a1, rd1, _, rd2 = _two_nn(dist.T, feat_a.valid)

    # Forward 1->2.
    fwd_ok = (d1 < (1.0 - match_conf) * d2) & feat_a.valid
    fwd_a = jnp.arange(ka, dtype=jnp.int32)
    fwd_b = b1

    # Reverse 2->1.
    rev_ok = (rd1 < (1.0 - match_conf) * rd2) & feat_b.valid
    # Duplicate suppression: (a1[j], j) already present iff fwd_ok[a1[j]]
    # and fwd_b[a1[j]] == j.
    dup = fwd_ok[a1] & (fwd_b[a1] == jnp.arange(kb, dtype=jnp.int32))
    rev_ok = rev_ok & ~dup

    a_idx = jnp.concatenate([fwd_a, a1])
    b_idx = jnp.concatenate([fwd_b, jnp.arange(kb, dtype=jnp.int32)])
    valid = jnp.concatenate([fwd_ok, rev_ok])

    src = feat_a.xy[a_idx]
    dst = feat_b.xy[b_idx]
    n_matches = jnp.sum(valid)

    if matcher_type == "affine":
        h, inlier, n_inl = ransac_affine_partial(src, dst, valid, key,
                                                 n_hyp=n_hyp)
    else:
        h, inlier, n_inl = ransac_homography(src, dst, valid, key,
                                             n_hyp=n_hyp)

    # num_matches_thresh1_ = 6: too few matches -> no geometry, conf 0.
    enough = n_matches >= 6
    conf = jnp.where(
        enough, n_inl.astype(jnp.float32) /
        (8.0 + 0.3 * n_matches.astype(jnp.float32)), 0.0)
    # "Too similar" images produce absurd confidence -> treat as unmatched
    # (`matchers.cpp` heuristic kept by the reference pipeline).
    conf = jnp.where(conf > 3.0, 0.0, conf)
    inlier = inlier & enough
    h = jnp.where(enough, h, jnp.eye(3, dtype=h.dtype))
    return PairMatches(
        a_idx=a_idx, b_idx=b_idx, valid=valid, inlier=inlier, h=h,
        num_inliers=jnp.where(enough, n_inl, 0),
        confidence=conf)


@functools.partial(jax.jit, static_argnames=("n_features", "matcher_type",
                                              "n_hyp"))
def register_pair(img_a: jnp.ndarray, img_b: jnp.ndarray, key: jnp.ndarray,
                  n_features: int = 1500, match_conf: float = 0.32,
                  matcher_type: str = "homography",
                  n_hyp: int = 512) -> PairMatches:
    """Pixels -> PairMatches in ONE device program.

    Fuses both ORB detections and the match into a single dispatch: the
    p50 latency of a pair registration is otherwise dominated by three
    tunnel round trips (~25ms each) rather than compute.
    img_*: (H, W) grayscale float/uint8.
    """
    from .features.orb import orb_detect_and_describe
    fa = orb_detect_and_describe(img_a, n_features=n_features)
    fb = orb_detect_and_describe(img_b, n_features=n_features)
    return match_pair(fa, fb, key, match_conf, matcher_type, n_hyp)


@functools.partial(jax.jit,
                   static_argnames=("matcher_type", "n_hyp", "range_width"))
def match_all_pairs(feats: Features, key: jnp.ndarray,
                    match_conf: float = 0.32,
                    matcher_type: str = "homography", n_hyp: int = 512,
                    range_width: int = -1) -> PairMatches:
    """All pairs in one vmapped computation.

    Only the upper triangle (i < j, within `range_width` when set —
    BestOf2NearestRangeMatcher) is computed; i > j comes from mirroring
    (swap roles, invert H) like OpenCV.  Returns PairMatches with leading
    (N, N).
    """
    n = feats.xy.shape[0]
    iu, ju = np.triu_indices(n, 1)
    if range_width > 0:
        keep = (ju - iu) < range_width
        iu, ju = iu[keep], ju[keep]
    ii = jnp.asarray(iu, jnp.int32)
    jj = jnp.asarray(ju, jnp.int32)
    n_pairs = len(iu)
    keys = jax.random.split(key, max(n_pairs, 1))

    def one(i, j, k):
        return match_pair(feats[i], feats[j], k, match_conf, matcher_type,
                          n_hyp)

    pm_flat = jax.vmap(one)(ii, jj, keys)

    # Scatter the computed pairs into dense (N, N) tables.
    def scatter(x):
        out = jnp.zeros((n, n) + x.shape[1:], x.dtype)
        return out.at[ii, jj].set(x)

    pm = jax.tree.map(scatter, pm_flat)

    # Mirror i>j from j<i like OpenCV (swap roles, invert H).
    def mirror(x, swap_idx=False):
        return jnp.swapaxes(x, 0, 1)

    # Guarded inverse: degenerate pairs (conf 0, e.g. too few matches)
    # carry identity / singular H — substitute identity BEFORE inverting
    # so no inf/nan is ever produced, and emit identity for them after.
    eye = jnp.eye(3, dtype=pm.h.dtype)
    hm = mirror(pm.h)
    h_ok = ((mirror(pm.confidence) > 0.0)
            & jnp.all(jnp.isfinite(hm), axis=(-2, -1))
            & (jnp.abs(jnp.linalg.det(hm)) > 1e-12))
    h_safe = jnp.where(h_ok[..., None, None], hm, eye)
    lower = PairMatches(
        a_idx=mirror(pm.b_idx), b_idx=mirror(pm.a_idx),
        valid=mirror(pm.valid), inlier=mirror(pm.inlier),
        h=jnp.where(h_ok[..., None, None], jnp.linalg.inv(h_safe), eye),
        num_inliers=mirror(pm.num_inliers),
        confidence=mirror(pm.confidence))

    tri = (jnp.arange(n)[:, None] < jnp.arange(n)[None, :])

    def sel(u, lo):
        cond = tri.reshape((n, n) + (1,) * (u.ndim - 2))
        return jnp.where(cond, u, lo)

    return PairMatches(
        a_idx=sel(pm.a_idx, lower.a_idx),
        b_idx=sel(pm.b_idx, lower.b_idx),
        valid=sel(pm.valid, lower.valid),
        inlier=sel(pm.inlier, lower.inlier),
        h=sel(pm.h, lower.h),
        num_inliers=sel(pm.num_inliers, lower.num_inliers),
        confidence=sel(pm.confidence, lower.confidence))
