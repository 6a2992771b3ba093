"""Isolate WHERE the SIFT inlier-ratio gap comes from (VERDICT r02 #4).

For ours and cv2 on the same synthetic GT pairs, measures:

  nn-correct   fraction of A-keypoints (with a GT-visible counterpart
               within 3 px in B) whose descriptor nearest neighbour in B
               is GT-consistent — a pure descriptor-discriminability
               metric, independent of ratio-test/matcher differences;
  tent-prec    GT-consistency of the tentative (ratio-test) match set;
  tent-count   size of that set.

The pipeline's inlier%% = RANSAC inliers / tentatives conflates
descriptor quality with tentative-set size; these split it.

Run: JAX_PLATFORMS=cpu python tools/exp_sift_descriptor.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import cv2  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_stitching_tpu.data.synth import make_ring_captures  # noqa: E402
from image_stitching_tpu.ops.features.sift import (  # noqa: E402
    sift_detect_and_describe)
from image_stitching_tpu.ops.imgproc import rgb_to_gray  # noqa: E402

N_FEATURES = 500
TOL = 3.0


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


def eval_desc(xy1, d1, xy2, d2, h_ab, ratio_sq=True):
    """Returns (nn_correct, tent_prec, n_tent) for squared-L2 2-NN with
    the pipeline's ratio semantics (d0 < 0.35 * d1 on squared dists)."""
    p = _project(h_ab, xy1)                       # A keypoints in B frame
    gt_d = np.linalg.norm(p[:, None] - xy2[None], axis=-1)  # (A, B)
    has_gt = gt_d.min(axis=1) < TOL

    dd = ((d1[:, None] - d2[None]) ** 2).sum(-1)  # squared L2 (A, B)
    nn = np.argsort(dd, axis=1)[:, :2]
    nn1 = nn[:, 0]
    d0 = dd[np.arange(len(xy1)), nn1]
    d1b = dd[np.arange(len(xy1)), nn[:, 1]]
    nn_ok = gt_d[np.arange(len(xy1)), nn1] < TOL
    nn_correct = float(nn_ok[has_gt].mean()) if has_gt.any() else np.nan

    tent = d0 < (1.0 - 0.65) * d1b if ratio_sq else \
        np.sqrt(d0) < (1.0 - 0.65) * np.sqrt(d1b)
    tent_prec = float(nn_ok[tent].mean()) if tent.any() else np.nan
    return nn_correct, tent_prec, int(tent.sum())


def main():
    rows = {"ours": [], "cv2": []}
    for seed in (5, 6, 7):
        g1, g2, h_ab = _pair_scene(seed)

        f1 = sift_detect_and_describe(g1, n_features=N_FEATURES)
        f2 = sift_detect_and_describe(g2, n_features=N_FEATURES)
        v1 = np.asarray(f1.valid)
        v2 = np.asarray(f2.valid)
        rows["ours"].append(eval_desc(
            np.asarray(f1.xy)[v1], np.asarray(f1.desc)[v1],
            np.asarray(f2.xy)[v2], np.asarray(f2.desc)[v2], h_ab))

        det = cv2.SIFT_create(N_FEATURES)
        u1 = np.clip(g1, 0, 255).astype(np.uint8)
        u2 = np.clip(g2, 0, 255).astype(np.uint8)
        kp1, c1 = det.detectAndCompute(u1, None)
        kp2, c2 = det.detectAndCompute(u2, None)
        rows["cv2"].append(eval_desc(
            np.array([k.pt for k in kp1]), c1.astype(np.float32),
            np.array([k.pt for k in kp2]), c2.astype(np.float32), h_ab))

    print(f"{'':8s} {'nn-correct':>10s} {'tent-prec':>10s} "
          f"{'tent-count':>10s}")
    for name, vals in rows.items():
        a = np.array(vals, dtype=float)
        print(f"{name:8s} {np.nanmean(a[:, 0]):10.3f} "
              f"{np.nanmean(a[:, 1]):10.3f} {a[:, 2].mean():10.0f}")


if __name__ == "__main__":
    main()
