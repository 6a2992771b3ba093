"""Homography-based camera estimation (the no-EXIF bootstrap path).

Capability parity with cv::detail::HomographyBasedEstimator as exercised by
the reference's dead-but-retained variant
(`/root/reference/image_stitching/image_stitchin3g.cpp:744-823`): estimate
per-image focals from pairwise homographies (autocalib) and chain rotations
over a maximum spanning tree of the match graph.

Host-side orchestration (graph walk over <=N nodes) around vectorized math.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..geometry.camera import Cameras
from ..geometry.rotation import orthonormalize

__all__ = ["focals_from_homography", "estimate_focal",
           "estimate_rotations_from_homographies", "homography_based_estimate"]


def focals_from_homography(h: np.ndarray) -> Tuple[Optional[float],
                                                   Optional[float]]:
    """(f0, f1) estimates from one H (None where underdetermined) —
    the classic autocalib decomposition (cv::detail::focalsFromHomography)."""
    h = np.asarray(h, np.float64).reshape(-1)

    f1 = None
    d1 = h[6] * h[7]
    d2 = (h[7] - h[6]) * (h[7] + h[6])
    v1 = -(h[0] * h[1] + h[3] * h[4]) / d1 if d1 != 0 else -1.0
    v2 = ((h[0] * h[0] + h[3] * h[3] - h[1] * h[1] - h[4] * h[4]) / d2
          if d2 != 0 else -1.0)
    if v1 < v2:
        v1, v2 = v2, v1
    if v1 > 0 and v2 > 0:
        f1 = float(np.sqrt(v1 if abs(d1) > abs(d2) else v2))
    elif v1 > 0:
        f1 = float(np.sqrt(v1))

    f0 = None
    d1 = h[0] * h[3] + h[1] * h[4]
    d2 = h[0] * h[0] + h[1] * h[1] - h[3] * h[3] - h[4] * h[4]
    v1 = -h[2] * h[5] / d1 if d1 != 0 else -1.0
    v2 = (h[5] * h[5] - h[2] * h[2]) / d2 if d2 != 0 else -1.0
    if v1 < v2:
        v1, v2 = v2, v1
    if v1 > 0 and v2 > 0:
        f0 = float(np.sqrt(v1 if abs(d1) > abs(d2) else v2))
    elif v1 > 0:
        f0 = float(np.sqrt(v1))
    return f0, f1


def estimate_focal(h_matrices: np.ndarray, confidence: np.ndarray,
                   image_sizes: List[Tuple[int, int]],
                   conf_thresh: float = 0.0) -> np.ndarray:
    """Median focal over all confident pairs; per-image (w+h)/2 fallback
    when too few estimates exist (cv::detail::estimateFocal)."""
    n = confidence.shape[0]
    ests = []
    for i in range(n):
        for j in range(n):
            if i == j or confidence[i, j] <= conf_thresh:
                continue
            # H must map centered coords for autocalib: shift principal
            # points to the image centers.
            wi, hi = image_sizes[i][1], image_sizes[i][0]
            wj, hj = image_sizes[j][1], image_sizes[j][0]
            # Centered-coordinate H: H_c = T_j @ H @ T_i^-1 with T shifting
            # the principal point to the origin, so the autocalib
            # decomposition sees pp = 0.
            ti_inv = np.array([[1, 0, 0.5 * wi], [0, 1, 0.5 * hi],
                               [0, 0, 1]], np.float64)
            tj_fwd = np.array([[1, 0, -0.5 * wj], [0, 1, -0.5 * hj],
                               [0, 0, 1]], np.float64)
            h_c = tj_fwd @ np.asarray(h_matrices[i, j], np.float64) @ ti_inv
            f0, f1 = focals_from_homography(h_c)
            if f0 is not None and f1 is not None:
                ests.append(float(np.sqrt(f0 * f1)))
    if len(ests) >= max(n - 1, 1):
        return np.full(n, float(np.median(ests)), np.float64)
    return np.array([(hw[0] + hw[1]) * 0.5 for hw in image_sizes],
                    np.float64)


def _max_spanning_tree(weight: np.ndarray) -> List[Tuple[int, int]]:
    """Prim's algorithm maximizing edge weight; returns tree edges."""
    n = weight.shape[0]
    in_tree = [0]
    edges = []
    remaining = set(range(1, n))
    while remaining:
        best = None
        for u in in_tree:
            for v in remaining:
                w = weight[u, v]
                if best is None or w > best[0]:
                    best = (w, u, v)
        _, u, v = best
        edges.append((u, v))
        in_tree.append(v)
        remaining.remove(v)
    return edges


def estimate_rotations_from_homographies(
        h_matrices: np.ndarray, focals: np.ndarray,
        image_sizes: List[Tuple[int, int]],
        weight: np.ndarray) -> np.ndarray:
    """Chain rotations over the max spanning tree.

    With our warp model ray = R K^-1 p and H_ij mapping p_i -> p_j:
    R_j = R_i (K_j^-1 H_ij K_i)^T, root = identity, each result projected
    to SO(3)."""
    n = len(focals)
    ks = []
    for idx in range(n):
        hgt, wid = image_sizes[idx]
        ks.append(np.array([[focals[idx], 0, 0.5 * wid],
                            [0, focals[idx], 0.5 * hgt],
                            [0, 0, 1]], np.float64))
    rs = [None] * n
    rs[0] = np.eye(3)
    for (u, v) in _max_spanning_tree(weight):
        h_uv = np.asarray(h_matrices[u, v], np.float64)
        rel = np.linalg.inv(ks[v]) @ h_uv @ ks[u]
        r_v = rs[u] @ rel.T
        rs[v] = np.asarray(orthonormalize(r_v.astype(np.float32)))
    return np.stack([np.asarray(r, np.float32) for r in rs])


def affine_based_estimate(pair_matches, image_sizes,
                          conf_thresh: float = 0.0) -> Cameras:
    """cv::detail::AffineBasedEstimator: chain pairwise affine transforms
    over the max spanning tree; camera.R holds each image's 3x3 affine
    into the common frame (A_j = A_i @ H_ij^-1 with H_ij mapping i -> j)."""
    conf = np.asarray(pair_matches.confidence)
    h = np.asarray(pair_matches.h)
    n = conf.shape[0]
    weight = np.asarray(pair_matches.num_inliers) * (conf > conf_thresh)
    rs = [None] * n
    rs[0] = np.eye(3, dtype=np.float64)
    for (u, v) in _max_spanning_tree(weight):
        h_uv = np.asarray(h[u, v], np.float64)
        h_uv = h_uv / h_uv[2, 2]
        rs[v] = rs[u] @ np.linalg.inv(h_uv)
    return Cameras(
        focal=np.ones(n, np.float32),
        aspect=np.ones(n, np.float32),
        ppx=np.zeros(n, np.float32),
        ppy=np.zeros(n, np.float32),
        R=np.stack([np.asarray(r, np.float32) for r in rs]),
        t=np.zeros((n, 3), np.float32))


def homography_based_estimate(pair_matches, image_sizes,
                              conf_thresh: float = 0.0) -> Cameras:
    """Full estimator: focals + rotations + center principal points."""
    conf = np.asarray(pair_matches.confidence)
    h = np.asarray(pair_matches.h)
    n = conf.shape[0]
    focals = estimate_focal(h, conf, image_sizes, conf_thresh)
    weight = np.asarray(pair_matches.num_inliers) * (conf > conf_thresh)
    rs = estimate_rotations_from_homographies(h, focals, image_sizes, weight)
    return Cameras(
        focal=focals.astype(np.float32),
        aspect=np.ones(n, np.float32),
        ppx=np.array([0.5 * s[1] for s in image_sizes], np.float32),
        ppy=np.array([0.5 * s[0] for s in image_sizes], np.float32),
        R=rs, t=np.zeros((n, 3), np.float32))
