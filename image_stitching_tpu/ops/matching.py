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

__all__ = ["PairMatches", "MatchGraph", "match_pair", "match_all_pairs",
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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MatchGraph:
    """All-pairs match result: dense per-pair SCALARS + a pair-LIST of the
    big correspondence tables.

    The per-pair geometry OpenCV's estimators read (H, confidence, inlier
    count, match count) is dense (N, N) with the i>j half mirrored
    (swapped roles, inverted H) like BestOf2NearestMatcher.  The O(K)
    correspondence tables exist ONLY for the computed upper-triangle
    (range-limited) pairs: `a_idx/b_idx/valid/inlier` are (P, M) with
    `ii/jj` (P,) naming pair p's images — at N=100/K=4000 defaults the old
    dense (N, N, 2K) scatter was ~0.8 GB of device memory and download;
    the pair list is P/N^2 of that and the range matcher shrinks P too.
    """

    ii: Any           # (P,) int32 — pair p is (ii[p], jj[p]), ii < jj
    jj: Any           # (P,) int32
    a_idx: Any        # (P, M) int32 feature indices in image ii
    b_idx: Any        # (P, M) int32 feature indices in image jj
    valid: Any        # (P, M) bool — ratio-test matches (capped at M)
    inlier: Any       # (P, M) bool — RANSAC inliers among valid
    h: Any            # (N, N, 3, 3)
    num_inliers: Any  # (N, N) int32
    confidence: Any   # (N, N) float32
    num_matches: Any  # (N, N) int32 — ratio-test match count (pre-cap)

    def tree_flatten(self):
        return ((self.ii, self.jj, self.a_idx, self.b_idx, self.valid,
                 self.inlier, self.h, self.num_inliers, self.confidence,
                 self.num_matches), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def subset(self, indices) -> "MatchGraph":
        """Re-index onto `indices` (host-side, after download): dense
        leaves via np.ix_, pair list filtered to pairs with both ends
        kept — the myLeaveBiggestComponent subset rewrite
        (`image_stitching.cpp:251-262`).  `indices` must be ascending so
        ii < jj is preserved."""
        idx = np.asarray(indices)
        assert np.all(np.diff(idx) > 0), "indices must be ascending"
        inv = np.full(self.confidence.shape[0], -1, np.int64)
        inv[idx] = np.arange(len(idx))
        ii = np.asarray(self.ii)
        jj = np.asarray(self.jj)
        keep = (inv[ii] >= 0) & (inv[jj] >= 0)
        sub = np.ix_(idx, idx)
        return MatchGraph(
            ii=inv[ii[keep]].astype(np.int32),
            jj=inv[jj[keep]].astype(np.int32),
            a_idx=np.asarray(self.a_idx)[keep],
            b_idx=np.asarray(self.b_idx)[keep],
            valid=np.asarray(self.valid)[keep],
            inlier=np.asarray(self.inlier)[keep],
            h=np.asarray(self.h)[sub],
            num_inliers=np.asarray(self.num_inliers)[sub],
            confidence=np.asarray(self.confidence)[sub],
            num_matches=np.asarray(self.num_matches)[sub])


def _pair_chunk(k: int) -> int:
    """Pairs per lax.map step: bound the transient per-chunk (K, K)
    distance matrices (plus epilogue copies) to ~600 MB so full-triu
    matching at default num_features=4000 cannot OOM the chip."""
    per_pair = max(k * k * 12, 1)
    c = max(1, min(64, int(6e8) // per_pair))
    return 1 << (c.bit_length() - 1)


@functools.partial(jax.jit,
                   static_argnames=("matcher_type", "n_hyp", "range_width",
                                    "pair_cap"))
def match_all_pairs(feats: Features, key: jnp.ndarray,
                    match_conf: float = 0.32,
                    matcher_type: str = "homography", n_hyp: int = 512,
                    range_width: int = -1,
                    pair_cap: int = -1) -> MatchGraph:
    """All pairs on device, memory-bounded.

    Only the upper triangle (i < j, within `range_width` when set —
    BestOf2NearestRangeMatcher) is computed; the dense (N, N) scalar
    tables get i > j by mirroring (swap roles, invert H) like OpenCV.
    Pairs run through `lax.map` in chunks sized so the per-chunk (K, K)
    distance matrices stay bounded regardless of N and K.

    pair_cap: static cap M on per-pair correspondence slots (<=0 keeps
    all 2K).  Valid matches are compacted to the front before capping, so
    a cap only ever drops ratio-test matches beyond M — num_matches /
    confidence are computed pre-cap and are exact either way.
    """
    n = feats.xy.shape[0]
    k = int(feats.xy.shape[1])
    iu, ju = np.triu_indices(n, 1)
    if range_width > 0:
        keep = (ju - iu) < range_width
        iu, ju = iu[keep], ju[keep]
    n_pairs = len(iu)
    m_slots = 2 * k if pair_cap <= 0 else min(pair_cap, 2 * k)
    if n_pairs == 0:
        return MatchGraph(
            ii=jnp.zeros((0,), jnp.int32), jj=jnp.zeros((0,), jnp.int32),
            a_idx=jnp.zeros((0, m_slots), jnp.int32),
            b_idx=jnp.zeros((0, m_slots), jnp.int32),
            valid=jnp.zeros((0, m_slots), bool),
            inlier=jnp.zeros((0, m_slots), bool),
            h=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, n, 3, 3)),
            num_inliers=jnp.zeros((n, n), jnp.int32),
            confidence=jnp.zeros((n, n), jnp.float32),
            num_matches=jnp.zeros((n, n), jnp.int32))

    keys = jax.random.split(key, n_pairs)
    chunk = _pair_chunk(k)
    n_chunks = -(-n_pairs // chunk)
    pad = n_chunks * chunk - n_pairs
    ii_p = np.concatenate([iu, np.zeros(pad, iu.dtype)])
    jj_p = np.concatenate([ju, np.zeros(pad, ju.dtype)])
    keys_p = jnp.concatenate(
        [keys, jnp.zeros((pad,) + keys.shape[1:], keys.dtype)])

    def one(i, j, kk):
        return match_pair(feats[i], feats[j], kk, match_conf, matcher_type,
                          n_hyp)

    pm_flat = jax.lax.map(
        lambda args: jax.vmap(one)(*args),
        (jnp.asarray(ii_p.reshape(n_chunks, chunk), jnp.int32),
         jnp.asarray(jj_p.reshape(n_chunks, chunk), jnp.int32),
         keys_p.reshape(n_chunks, chunk, *keys.shape[1:])))
    pm_flat = jax.tree.map(
        lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:n_pairs],
        pm_flat)

    num_matches = jnp.sum(pm_flat.valid, axis=-1).astype(jnp.int32)
    if m_slots < 2 * k:
        # Compact valid slots to the front (stable: feature order kept),
        # then truncate to the static cap.
        order = jnp.argsort(~pm_flat.valid, axis=-1,
                            stable=True)[:, :m_slots]

        def take(x):
            return jnp.take_along_axis(x, order, axis=-1)
        a_idx, b_idx = take(pm_flat.a_idx), take(pm_flat.b_idx)
        valid, inlier = take(pm_flat.valid), take(pm_flat.inlier)
    else:
        a_idx, b_idx = pm_flat.a_idx, pm_flat.b_idx
        valid, inlier = pm_flat.valid, pm_flat.inlier

    ii = jnp.asarray(iu, jnp.int32)
    jj = jnp.asarray(ju, jnp.int32)

    # Dense per-pair scalars, upper triangle scattered, lower mirrored.
    def scat(x):
        out = jnp.zeros((n, n) + x.shape[1:], x.dtype)
        return out.at[ii, jj].set(x)

    h_u = scat(pm_flat.h)
    conf_u = scat(pm_flat.confidence)
    ninl_u = scat(pm_flat.num_inliers)
    nm_u = scat(num_matches)

    def mirror(x):
        return jnp.swapaxes(x, 0, 1)

    # Guarded inverse: degenerate pairs (conf 0, e.g. too few matches)
    # carry identity / singular H — substitute identity BEFORE inverting
    # so no inf/nan is ever produced, and emit identity for them after.
    eye = jnp.eye(3, dtype=h_u.dtype)
    hm = mirror(h_u)
    h_ok = ((mirror(conf_u) > 0.0)
            & jnp.all(jnp.isfinite(hm), axis=(-2, -1))
            & (jnp.abs(jnp.linalg.det(hm)) > 1e-12))
    h_safe = jnp.where(h_ok[..., None, None], hm, eye)
    h_lo = jnp.where(h_ok[..., None, None], jnp.linalg.inv(h_safe), eye)

    tri = (jnp.arange(n)[:, None] < jnp.arange(n)[None, :])
    return MatchGraph(
        ii=ii, jj=jj, a_idx=a_idx, b_idx=b_idx, valid=valid, inlier=inlier,
        h=jnp.where(tri[..., None, None], h_u, h_lo),
        num_inliers=jnp.where(tri, ninl_u, mirror(ninl_u)),
        confidence=jnp.where(tri, conf_u, mirror(conf_u)),
        num_matches=jnp.where(tri, nm_u, mirror(nm_u)))
