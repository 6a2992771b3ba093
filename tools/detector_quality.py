"""Detector quality measurement: repeatability + match-confidence regime.

Quantifies each detector family (reference feature-finder choices at
/root/reference/image_stitching/image_stitching.cpp:567-599) on synthetic
adjacent-view pairs with known ground-truth homography:

  * repeatability: fraction of keypoints detected in view A whose
    ground-truth projection into view B lands within 3 px of a view-B
    keypoint (the standard Mikolajczyk detector-repeatability criterion,
    computed symmetrically);
  * match confidence: BestOf2Nearest confidence (inliers / (8 + 0.3 m))
    of our full matcher on the pair — the quantity the pipeline gates on
    (`conf_thresh`, default 1.0);
  * inlier ratio of the RANSAC fit.

cv2 oracle columns where this build binds the counterpart (ORB, SIFT;
AKAZE/SURF are not exposed by this cv2 build), matched with
cv2.detail.BestOf2NearestMatcher so the confidence formula is identical.

Run on CPU:  JAX_PLATFORMS=cpu python tools/detector_quality.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import cv2  # noqa: E402
import jax  # noqa: E402

# The env var alone does not stop the axon TPU plugin from initializing
# (and touching the exclusive chip); the config must be forced before any
# backend use (CLAUDE.md).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_stitching_tpu.data.synth import make_ring_captures  # noqa: E402
from image_stitching_tpu.ops.features import (  # noqa: E402
    orb_detect_and_describe)
from image_stitching_tpu.ops.features.akaze import (  # noqa: E402
    akaze_detect_and_describe)
from image_stitching_tpu.ops.features.sift import (  # noqa: E402
    sift_detect_and_describe)
from image_stitching_tpu.ops.features.surf import (  # noqa: E402
    surf_detect_and_describe)
from image_stitching_tpu.ops.imgproc import rgb_to_gray  # noqa: E402
from image_stitching_tpu.ops.matching import match_pair  # noqa: E402

N_FEATURES = 500
REPEAT_TOL_PX = 3.0


def _pair_scene(seed: int):
    images, k, rs = make_ring_captures(
        n_images=2, hw=(480, 640), fov_deg=55, overlap_ratio=0.5,
        seed=seed)
    h_ab = k @ rs[1].T @ rs[0] @ np.linalg.inv(k)
    g = [np.asarray(rgb_to_gray(img.astype(np.float32)))
         for img in images]
    return g[0], g[1], h_ab.astype(np.float64)


def _project(h, xy):
    q = (h @ np.concatenate([xy, np.ones((len(xy), 1))], 1).T)
    return (q[:2] / q[2:]).T


def _repeatability(xy_a, xy_b, h_ab, shape):
    """Symmetric 3px repeatability over keypoints whose projection stays
    in-bounds."""
    hh, ww = shape

    def one_way(src, dst, h):
        p = _project(h, src)
        inb = ((p[:, 0] >= 0) & (p[:, 0] < ww) &
               (p[:, 1] >= 0) & (p[:, 1] < hh))
        if inb.sum() == 0 or len(dst) == 0:
            return np.nan
        d = np.linalg.norm(p[inb, None, :] - dst[None, :, :], axis=-1)
        return float((d.min(axis=1) < REPEAT_TOL_PX).mean())

    return np.nanmean([one_way(xy_a, xy_b, h_ab),
                       one_way(xy_b, xy_a, np.linalg.inv(h_ab))])


def measure_ours(det, g1, g2, h_ab, match_conf):
    f1 = det(g1, n_features=N_FEATURES)
    f2 = det(g2, n_features=N_FEATURES)
    xy1 = np.asarray(f1.xy)[np.asarray(f1.valid)]
    xy2 = np.asarray(f2.xy)[np.asarray(f2.valid)]
    rep = _repeatability(xy1, xy2, h_ab, g1.shape)
    # Per-family match_conf like the reference pipeline (0.65 float /
    # 0.32 binary, image_stitching.cpp:55-62): measuring the float
    # families at the binary default produced a 2x dirtier tentative set
    # and understated the inlier ratio by ~20 points (NOTES_r03).
    pm = match_pair(f1, f2, jax.random.PRNGKey(0),
                    match_conf=match_conf)
    conf = float(pm.confidence)
    ninl = int(pm.num_inliers)
    nmatch = int(np.asarray(pm.valid).sum())
    return dict(n1=len(xy1), n2=len(xy2), rep=rep, conf=conf,
                inl=ninl, m=nmatch,
                ratio=ninl / max(nmatch, 1))


def measure_cv2(make, norm, g1, g2, h_ab, match_conf):
    det = make()
    u1 = np.clip(g1, 0, 255).astype(np.uint8)
    u2 = np.clip(g2, 0, 255).astype(np.uint8)
    kp1, d1 = det.detectAndCompute(u1, None)
    kp2, d2 = det.detectAndCompute(u2, None)
    xy1 = np.array([k.pt for k in kp1]) if kp1 else np.zeros((0, 2))
    xy2 = np.array([k.pt for k in kp2]) if kp2 else np.zeros((0, 2))
    rep = _repeatability(xy1, xy2, h_ab, g1.shape)
    f1, f2 = cv2.detail.ImageFeatures(), cv2.detail.ImageFeatures()
    f1.img_idx, f2.img_idx = 0, 1
    f1.img_size = (g1.shape[1], g1.shape[0])
    f2.img_size = (g2.shape[1], g2.shape[0])
    f1.keypoints, f1.descriptors = kp1, cv2.UMat(d1)
    f2.keypoints, f2.descriptors = kp2, cv2.UMat(d2)
    matcher = cv2.detail.BestOf2NearestMatcher_create(False, match_conf)
    pw = matcher.apply2([f1, f2])
    m01 = pw[1]  # (0 -> 1)
    nmatch = len(m01.getMatches())
    return dict(n1=len(xy1), n2=len(xy2), rep=rep,
                conf=float(m01.confidence), inl=int(m01.num_inliers),
                m=nmatch, ratio=m01.num_inliers / max(nmatch, 1))


def main():
    ours = {
        "orb": orb_detect_and_describe,
        "sift": sift_detect_and_describe,
        "surf": surf_detect_and_describe,
        "akaze": akaze_detect_and_describe,
    }
    cv_makers = {
        "orb": (lambda: cv2.ORB_create(N_FEATURES), cv2.NORM_HAMMING),
        "sift": (lambda: cv2.SIFT_create(N_FEATURES), cv2.NORM_L2),
    }
    only = os.environ.get("DQ_FAMILIES", "")
    if only:
        keep = set(only.split(","))
        ours = {k: v for k, v in ours.items() if k in keep}
    seeds = [21, 22, 23]
    rows = []
    for name, det in ours.items():
        mc = 0.65 if name in ("sift", "surf") else 0.32
        acc = []
        for s in seeds:
            g1, g2, h_ab = _pair_scene(s)
            acc.append(measure_ours(det, g1, g2, h_ab, mc))
        mean = {k: float(np.mean([a[k] for a in acc])) for k in acc[0]}
        rows.append(("ours/" + name, mean))
        if name in cv_makers:
            mk, norm = cv_makers[name]
            acc = []
            for s in seeds:
                g1, g2, h_ab = _pair_scene(s)
                acc.append(measure_cv2(mk, norm, g1, g2, h_ab, mc))
            mean = {k: float(np.mean([a[k] for a in acc])) for k in acc[0]}
            rows.append(("cv2/" + name, mean))

    print(f"{'detector':<12} {'kp/img':>7} {'repeat':>7} {'conf':>6} "
          f"{'inliers':>8} {'matches':>8} {'inl%':>6}")
    for name, m in rows:
        print(f"{name:<12} {m['n1']:>7.0f} {m['rep']:>7.3f} "
              f"{m['conf']:>6.2f} {m['inl']:>8.0f} {m['m']:>8.0f} "
              f"{100 * m['ratio']:>5.1f}%")


if __name__ == "__main__":
    main()
