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
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, shape=(n_hyp, 4))

    s4 = src[idx]                                          # (n_hyp, 4, 2)
    d4 = dst[idx]

    # Minimal 4-point DLT per hypothesis: smallest eigenvector of the
    # (9, 9) normal matrix A^T A — far cheaper on TPU than a batched SVD
    # of (8, 9).
    def build(s, d):
        x, y = s[:, 0], s[:, 1]
        u, v = d[:, 0], d[:, 1]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], -1)
        r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], -1)
        return jnp.concatenate([r1, r2], axis=0)

    # Condition: normalize by a global scale (cheap, fixed).
    scale = jnp.maximum(jnp.max(jnp.where(valid[:, None], jnp.abs(src), 0.0)),
                        1.0)
    t = jnp.array([[1.0 / scale, 0, 0], [0, 1.0 / scale, 0], [0, 0, 1.0]])
    tinv = jnp.array([[scale, 0, 0], [0, scale, 0], [0, 0, 1.0]])
    a = jax.vmap(build)(s4 / scale, d4 / scale)            # (n_hyp, 8, 9)
    # Minimal solve with h22 pinned to 1: an (8, 8) batched LU solve is an
    # order of magnitude faster on TPU than eigh/SVD of the normal matrix.
    # Hypotheses where h22 ~ 0 come out singular and lose the vote anyway.
    a8 = a[:, :, :8]
    b8 = -a[:, :, 8]
    eye8 = 1e-9 * jnp.eye(8)
    h8 = jnp.linalg.solve(
        jnp.einsum("nri,nrj->nij", a8, a8) + eye8,
        jnp.einsum("nri,nr->ni", a8, b8)[..., None])[..., 0]
    h_n = jnp.concatenate([h8, jnp.ones((h8.shape[0], 1), h8.dtype)],
                          axis=1).reshape(-1, 3, 3)
    h_all = jnp.einsum("ij,njk,kl->nil", tinv, h_n, t)

    # Score hypotheses on a bounded subsample of the correspondences
    # (full M x n_hyp scoring is O(GBs) at 8k matches x 2k hypotheses);
    # the winner's mask is then recomputed on ALL correspondences below.
    m_score = min(m, 1024)
    sub = jax.random.choice(jax.random.fold_in(key, 1),
                            m, shape=(m_score,), replace=True,
                            p=jnp.where(valid, 1.0, 0.0) /
                            jnp.maximum(jnp.sum(valid), 1))
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
    # Refit on consensus, then recompute the final inlier set (OpenCV
    # re-estimates H from inliers when enough support exists).
    h_fit = dlt_homography(src, dst, mask0.astype(src.dtype))
    err2 = jnp.sum((apply_h(h_fit, src) - dst) ** 2, axis=-1)
    mask = (err2 < thresh * thresh) & valid
    # Guard: if refit somehow lost the consensus, keep the minimal model.
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
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, shape=(n_hyp, 2))
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
