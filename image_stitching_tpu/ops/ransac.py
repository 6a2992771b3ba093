"""Vmapped RANSAC homography / affine estimation.

Replaces cv::findHomography(RANSAC) and estimateAffinePartial2D as used
inside cv::detail::BestOf2NearestMatcher / AffineBestOf2NearestMatcher
(`image_stitching.cpp:643-655`).  TPU-first shape: a fixed number of
hypotheses solved as one batched 8x9 (or 4x5) SVD, vectorized inlier
scoring, masked weighted DLT refit on the winning consensus set — no
data-dependent control flow (BASELINE.json north_star: 'thousands of
vmapped 4-point DLT solves with vectorized inlier scoring').
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["ransac_homography", "ransac_affine_partial", "apply_h",
           "dlt_homography"]


def apply_h(h: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) x (..., N, 2) -> (..., N, 2) projective transform."""
    ones = jnp.ones_like(pts[..., :1])
    p = jnp.concatenate([pts, ones], axis=-1)
    q = jnp.einsum("...ij,...nj->...ni", h, p)
    return q[..., :2] / jnp.where(jnp.abs(q[..., 2:]) < 1e-12, 1e-12,
                                  q[..., 2:])


def _normalizer(pts: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Hartley normalization matrix from weighted stats."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mean = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1))
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-6)
    return jnp.array([[s, 0.0, -s * mean[0]],
                      [0.0, s, -s * mean[1]],
                      [0.0, 0.0, 1.0]], dtype=pts.dtype)


def _adjugate3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate of (..., 3, 3): inv(M) up to the 1/det factor
    (homographies are scale-free, so the det division can be skipped)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    r0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1)
    r1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1)
    r2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1)
    return jnp.stack([r0, r1, r2], -2)


def _quad_h(q: jnp.ndarray) -> jnp.ndarray:
    """Projective map unit square -> quad, (..., 4, 2) -> (..., 3, 3).

    Classic closed form (Heckbert): corners (0,0),(1,0),(1,1),(0,1) map to
    q[0..3].  Pure elementwise arithmetic — no linear solve — so a 4-point
    homography hypothesis costs a handful of VPU flops instead of a batched
    8x8 LU (which dominated vmapped matching at ~75 ms/pair on v5e)."""
    x0, y0 = q[..., 0, 0], q[..., 0, 1]
    x1, y1 = q[..., 1, 0], q[..., 1, 1]
    x2, y2 = q[..., 2, 0], q[..., 2, 1]
    x3, y3 = q[..., 3, 0], q[..., 3, 1]
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    dx1, dy1 = x1 - x2, y1 - y2
    dx2, dy2 = x3 - x2, y3 - y2
    den = dx1 * dy2 - dy1 * dx2
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    g = (sx * dy2 - sy * dx2) / den
    h = (dx1 * sy - dy1 * sx) / den
    r0 = jnp.stack([x1 - x0 + g * x1, x3 - x0 + h * x3, x0], -1)
    r1 = jnp.stack([y1 - y0 + g * y1, y3 - y0 + h * y3, y0], -1)
    r2 = jnp.stack([g, h, jnp.ones_like(g)], -1)
    return jnp.stack([r0, r1, r2], -2)


def h4_closed_form(s4: jnp.ndarray, d4: jnp.ndarray) -> jnp.ndarray:
    """4-point homography (..., 4, 2) x (..., 4, 2) -> (..., 3, 3), via
    H = (unit-square -> dst quad) o (unit-square -> src quad)^-1."""
    h = _quad_h(d4) @ _adjugate3(_quad_h(s4))
    h22 = h[..., 2:3, 2:3]
    return h / jnp.where(jnp.abs(h22) < 1e-12, 1e-12, h22)


def _sample_valid(key: jnp.ndarray, valid: jnp.ndarray,
                  shape: Tuple[int, ...]) -> jnp.ndarray:
    """Uniform indices into the valid slots, cheaply.

    `jax.random.categorical`/`choice` materialize a (draws, M) Gumbel/weight
    tensor (~1 GB at b=64 pairs x 2k hypotheses); instead compact the valid
    indices to the front once (one argsort) and draw uniform ints."""
    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    u = jax.random.uniform(key, shape)
    pick = jnp.minimum((u * n_valid).astype(jnp.int32), n_valid - 1)
    return order[pick]


def _sample_valid_distinct(key: jnp.ndarray, valid: jnp.ndarray,
                           n_rows: int, k: int) -> jnp.ndarray:
    """(n_rows, k) indices into valid slots, distinct within each row.

    Sequential sampling without replacement, unrolled over the static k
    slots: slot j draws uniform in [0, n_valid - j) and shifts past the
    previously chosen values in ascending order — still O(n_rows * k^2)
    elementwise work, no (rows, M) tensor.  With replacement, a 4-point
    draw repeats a point with prob ~6/n_valid, wasting that hypothesis on
    a degenerate quad (the den clamp in `_quad_h` makes it lose the vote);
    distinct draws recover the full hypothesis budget at small M.
    Degenerate case n_valid < k falls back to clamped (duplicate) picks."""
    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    u = jax.random.uniform(key, (n_rows, k))
    chosen = []
    for j in range(k):
        rng_j = jnp.maximum(n_valid - j, 1)
        v = jnp.minimum((u[:, j] * rng_j).astype(jnp.int32), rng_j - 1)
        if chosen:
            prev_sorted = jnp.sort(jnp.stack(chosen, -1), axis=-1)
            for t in range(j):
                v = v + (v >= prev_sorted[:, t]).astype(jnp.int32)
        # In-range guard for n_valid < k (shifting can walk past the end).
        v = jnp.minimum(v, n_valid - 1)
        chosen.append(v)
    return order[jnp.stack(chosen, -1)]


def dlt_homography(src: jnp.ndarray, dst: jnp.ndarray,
                   w: jnp.ndarray) -> jnp.ndarray:
    """Weighted normalized DLT over N correspondences -> 3x3 H.

    Accumulates A^T diag(w) A (9x9) and takes the smallest eigenvector, so
    the consensus-set refit needs no dynamic shapes.
    """
    tn_s = _normalizer(src, w)
    tn_d = _normalizer(dst, w)
    sn = apply_h(tn_s, src)
    dn = apply_h(tn_d, dst)
    x, y = sn[:, 0], sn[:, 1]
    u, v = dn[:, 0], dn[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    row1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], -1)
    row2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], -1)
    a = jnp.concatenate([row1, row2], axis=0)              # (2N, 9)
    ww = jnp.concatenate([w, w], axis=0)
    ata = (a * ww[:, None]).T @ a                           # (9, 9)
    evals, evecs = jnp.linalg.eigh(ata)
    hn = evecs[:, 0].reshape(3, 3)
    h = jnp.linalg.inv(tn_d) @ hn @ tn_s
    return h / jnp.where(jnp.abs(h[2, 2]) < 1e-12, 1e-12, h[2, 2])


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_homography(src: jnp.ndarray, dst: jnp.ndarray,
                      valid: jnp.ndarray, key: jnp.ndarray,
                      thresh: float = 3.0,
                      n_hyp: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                 jnp.ndarray]:
    """RANSAC H from masked correspondences.

    src, dst: (M, 2); valid: (M,) bool; returns (H, inlier_mask, n_inliers).
    Invalid slots never count as inliers and are never (effectively) sampled.
    """
    m = src.shape[0]
    idx = _sample_valid_distinct(key, valid, n_hyp, 4)

    s4 = src[idx]                                          # (n_hyp, 4, 2)
    d4 = dst[idx]

    # Condition: normalize by a global scale (cheap, fixed).
    scale = jnp.maximum(jnp.max(jnp.where(valid[:, None], jnp.abs(src), 0.0)),
                        1.0)
    t = jnp.array([[1.0 / scale, 0, 0], [0, 1.0 / scale, 0], [0, 0, 1.0]])
    tinv = jnp.array([[scale, 0, 0], [0, scale, 0], [0, 0, 1.0]])
    # Closed-form 4-point homography (unit-square route): pure elementwise
    # arithmetic, no batched LU/SVD — the TPU-friendly hypothesis factory.
    h_n = h4_closed_form(s4 / scale, d4 / scale)
    h_all = jnp.einsum("ij,njk,kl->nil", tinv, h_n, t)

    # Score hypotheses on a bounded subsample of the correspondences
    # (full M x n_hyp scoring is O(GBs) at 8k matches x 2k hypotheses);
    # the winner's mask is then recomputed on ALL correspondences below.
    m_score = min(m, 1024)
    sub = _sample_valid(jax.random.fold_in(key, 1), valid, (m_score,))
    src_s = src[sub]
    dst_s = dst[sub]
    proj = apply_h(h_all, jnp.broadcast_to(src_s, (n_hyp, m_score, 2)))
    err2 = jnp.sum((proj - dst_s[None]) ** 2, axis=-1)
    counts = jnp.sum(err2 < thresh * thresh, axis=-1)
    # Penalize degenerate hypotheses (tiny det).
    det = jnp.abs(jnp.linalg.det(h_all))
    counts = jnp.where(det > 1e-8, counts, -1)
    best = jnp.argmax(counts)

    # Full inlier mask of the winning hypothesis.
    err2 = jnp.sum((apply_h(h_all[best], src) - dst) ** 2, axis=-1)
    mask0 = (err2 < thresh * thresh) & valid
    # IRLS polish (the analogue of OpenCV's post-RANSAC LM refinement):
    # hard-consensus refit is noisy with few matches — which quad RANSAC
    # happened to draw decides which 3px-boundary mismatches join the
    # consensus and bias the fit.  Cauchy-weighted refits converge to the
    # same H regardless of the draw (weights fade the boundary cases).
    sig2 = (0.5 * thresh) ** 2

    def round_(h_cur, _):
        e2 = jnp.sum((apply_h(h_cur, src) - dst) ** 2, axis=-1)
        w = jnp.where(valid, 1.0 / (1.0 + e2 / sig2), 0.0)
        return dlt_homography(src, dst, w.astype(src.dtype)), None

    h_fit, _ = jax.lax.scan(round_, h_all[best], None, length=4)
    err2 = jnp.sum((apply_h(h_fit, src) - dst) ** 2, axis=-1)
    mask = (err2 < thresh * thresh) & valid
    # Guard: if the polish somehow lost the consensus, keep the minimal
    # model (degenerate weight collapse).
    use_fit = jnp.sum(mask) >= jnp.sum(mask0)
    h_best = jnp.where(use_fit, h_fit, h_all[best])
    mask = jnp.where(use_fit, mask, mask0)
    return h_best, mask, jnp.sum(mask)


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_affine_partial(src: jnp.ndarray, dst: jnp.ndarray,
                          valid: jnp.ndarray, key: jnp.ndarray,
                          thresh: float = 3.0, n_hyp: int = 512):
    """RANSAC similarity (rotation+scale+translation) like
    cv::estimateAffinePartial2D — the AffineBestOf2NearestMatcher core.
    Returns (H 3x3 with affine rows, inlier_mask, n_inliers)."""
    idx = _sample_valid_distinct(key, valid, n_hyp, 2)
    s2 = src[idx]
    d2 = dst[idx]

    def solve2(s, d):
        # Similarity from 2 points: complex ratio (d1-d0)/(s1-s0).
        sv = (s[1] - s[0])
        dv = (d[1] - d[0])
        den = sv[0] * sv[0] + sv[1] * sv[1]
        den = jnp.where(den < 1e-12, 1e-12, den)
        a = (dv[0] * sv[0] + dv[1] * sv[1]) / den
        b = (dv[1] * sv[0] - dv[0] * sv[1]) / den
        tx = d[0, 0] - (a * s[0, 0] - b * s[0, 1])
        ty = d[0, 1] - (b * s[0, 0] + a * s[0, 1])
        return jnp.array([[a, -b, tx], [b, a, ty], [0.0, 0.0, 1.0]])

    h_all = jax.vmap(solve2)(s2, d2)
    proj = apply_h(h_all, src[None].repeat(n_hyp, 0))
    err2 = jnp.sum((proj - dst[None]) ** 2, axis=-1)
    inl = (err2 < thresh * thresh) & valid[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    mask = inl[best]

    # Weighted least-squares refit of (a, b, tx, ty) on the consensus.
    w = mask.astype(src.dtype)
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    a1 = jnp.stack([x, -y, one, zero], -1)
    a2 = jnp.stack([y, x, zero, one], -1)
    a_mat = jnp.concatenate([a1, a2], 0)
    b_vec = jnp.concatenate([u, v], 0)
    ww = jnp.concatenate([w, w], 0)
    ata = (a_mat * ww[:, None]).T @ a_mat + 1e-6 * jnp.eye(4)
    atb = (a_mat * ww[:, None]).T @ b_vec
    sol = jnp.linalg.solve(ata, atb)
    h_fit = jnp.array([[sol[0], -sol[1], sol[2]],
                       [sol[1], sol[0], sol[3]],
                       [0.0, 0.0, 1.0]])
    err2 = jnp.sum((apply_h(h_fit, src) - dst) ** 2, axis=-1)
    mask_fit = (err2 < thresh * thresh) & valid
    use_fit = jnp.sum(mask_fit) >= counts[best]
    h_best = jnp.where(use_fit, h_fit, h_all[best])
    mask = jnp.where(use_fit, mask_fit, mask)
    return h_best, mask, jnp.sum(mask)
