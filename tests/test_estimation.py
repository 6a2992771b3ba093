"""Tests for components, wave correction, focal estimation, bundle adjust."""

import cv2
import numpy as np
import pytest

from image_stitching_tpu.estimation import (
    BAProblem, biggest_component, bundle_adjust, estimate_focal,
    focals_from_homography, homography_based_estimate, wave_correct)
from image_stitching_tpu.config import WaveCorrectKind
from image_stitching_tpu.geometry.camera import Cameras
from image_stitching_tpu.geometry.rotation import rodrigues_to_matrix


def ring_cameras(n, focal=800.0, pitch=0.1):
    rs = []
    for i in range(n):
        yaw = 2 * np.pi * i / n * 0.15
        r = (cv2.Rodrigues(np.float32([pitch, 0, 0]))[0] @
             cv2.Rodrigues(np.float32([0, yaw, 0]))[0])
        rs.append(r.astype(np.float32))
    return Cameras(
        focal=np.full(n, focal, np.float32),
        aspect=np.ones(n, np.float32),
        ppx=np.full(n, 320.0, np.float32),
        ppy=np.full(n, 240.0, np.float32),
        R=np.stack(rs), t=np.zeros((n, 3), np.float32))


def synth_correspondences(cams, n_per_edge=60, noise=0.0, seed=0):
    """Project common world rays into consecutive camera pairs."""
    rng = np.random.default_rng(seed)
    n = len(cams)
    k = np.asarray(cams.K())
    r = np.asarray(cams.R)
    cam_i, cam_j, p_i, p_j = [], [], [], []
    for i in range(n - 1):
        j = i + 1
        got_i, got_j = [], []
        while len(got_i) < n_per_edge:
            d = rng.normal(size=3)
            d[2] = abs(d[2]) + 1.0
            d /= np.linalg.norm(d)
            # ray in world frame must be in front of both cameras
            pi_ = k[i] @ (r[i].T @ d)
            pj_ = k[j] @ (r[j].T @ d)
            if pi_[2] <= 0.05 or pj_[2] <= 0.05:
                continue
            got_i.append(pi_[:2] / pi_[2])
            got_j.append(pj_[:2] / pj_[2])
        cam_i += [i] * n_per_edge
        cam_j += [j] * n_per_edge
        p_i += got_i
        p_j += got_j
    p_i = np.asarray(p_i, np.float32) + rng.normal(0, noise, (len(p_i), 2))
    p_j = np.asarray(p_j, np.float32) + rng.normal(0, noise, (len(p_j), 2))
    return BAProblem(cam_i=np.asarray(cam_i, np.int32),
                     cam_j=np.asarray(cam_j, np.int32),
                     p_i=p_i.astype(np.float32), p_j=p_j.astype(np.float32),
                     w=np.ones(len(p_i), np.float32))


# ------------------------------------------------------------ components ----
def test_biggest_component():
    conf = np.zeros((6, 6))
    conf[0, 1] = conf[1, 0] = 1.0
    conf[1, 2] = conf[2, 1] = 1.0
    conf[3, 4] = conf[4, 3] = 1.0
    kept, removed = biggest_component(conf, 0.95)
    assert kept == [0, 1, 2]
    assert removed == [3, 4, 5]
    kept, removed = biggest_component(conf, 1.5)
    assert len(kept) == 1 and len(removed) == 5


# ---------------------------------------------------------- wave correct ----
def test_wave_correct_matches_opencv():
    cams = ring_cameras(7, pitch=0.15)
    rmats = [np.asarray(r) for r in np.asarray(cams.R)]
    cv_out = cv2.detail.waveCorrect([m.copy() for m in rmats],
                                    cv2.detail.WAVE_CORRECT_HORIZ)
    my_out = np.asarray(wave_correct(np.stack(rmats), WaveCorrectKind.HORIZ))
    for a, b in zip(cv_out, my_out):
        np.testing.assert_allclose(b, a, atol=1e-4)


def test_wave_correct_vert_matches_opencv():
    # Vertical panorama: cameras spread in pitch with a slight roll.
    from scipy.spatial.transform import Rotation as SR
    rs = [(SR.from_euler("x", 0.3 * i).as_matrix() @
           SR.from_euler("z", 0.02).as_matrix()).astype(np.float32)
          for i in range(6)]
    cv_out = cv2.detail.waveCorrect([m.copy() for m in rs],
                                    cv2.detail.WAVE_CORRECT_VERT)
    my_out = np.asarray(wave_correct(np.stack(rs), WaveCorrectKind.VERT))
    for a, b in zip(cv_out, my_out):
        np.testing.assert_allclose(b, a, atol=1e-4)


def test_wave_correct_no():
    cams = ring_cameras(3)
    out = wave_correct(np.asarray(cams.R), WaveCorrectKind.NO)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(cams.R))


# ---------------------------------------------------------------- focals ----
def test_focals_from_homography_pure_rotation():
    f = 700.0
    k = np.diag([f, f, 1.0])
    r = cv2.Rodrigues(np.float32([0.05, 0.3, 0.02]))[0]
    # H for centered coords: K R^T(rel) K^-1 (pure rotation pair).
    h = k @ r @ np.linalg.inv(k)
    f0, f1 = focals_from_homography(h / h[2, 2])
    assert f0 is not None and f1 is not None
    assert np.sqrt(f0 * f1) == pytest.approx(f, rel=0.05)


def test_homography_based_estimate_recovers_geometry():
    # Build synthetic pairwise H from known cameras; estimator should get
    # focal within ~10% and consistent relative rotations.
    cams = ring_cameras(4, focal=650.0)
    n = len(cams)
    k = np.asarray(cams.K())
    r = np.asarray(cams.R)
    h = np.zeros((n, n, 3, 3), np.float32)
    conf = np.zeros((n, n), np.float32)
    ninl = np.zeros((n, n), np.int32)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            h[i, j] = (k[j] @ r[j].T @ r[i] @ np.linalg.inv(k[i]))
            h[i, j] /= h[i, j, 2, 2]
            conf[i, j] = 1.0
            ninl[i, j] = 100

    class PM:
        pass
    pm = PM()
    pm.confidence = conf
    pm.h = h
    pm.num_inliers = ninl
    est = homography_based_estimate(pm, [(480, 640)] * n, 0.5)
    np.testing.assert_allclose(np.asarray(est.focal),
                               650.0 * np.ones(n), rtol=0.1)
    # Relative rotations preserved: R_est_j R_est_i^T ~ R_j R_i^T.
    r_est = np.asarray(est.R)
    for i in range(n - 1):
        rel_est = r_est[i + 1] @ r_est[i].T
        rel_true = r[i + 1] @ r[i].T
        np.testing.assert_allclose(rel_est, rel_true, atol=5e-2)


# -------------------------------------------------------------------- BA ----
def test_bundle_adjust_noop_mask_and_no():
    cams = ring_cameras(3)
    prob = synth_correspondences(cams, n_per_edge=20)
    out = bundle_adjust(cams, prob, cost_func="no")
    np.testing.assert_array_equal(np.asarray(out.R), np.asarray(cams.R))
    with pytest.raises(ValueError, match="Unknown bundle adjustment"):
        bundle_adjust(cams, prob, cost_func="huh")


@pytest.mark.parametrize("cost", ["reproj", "ray"])
def test_bundle_adjust_recovers_rotations(cost):
    true_cams = ring_cameras(4)
    prob = synth_correspondences(true_cams, n_per_edge=50, noise=0.3)
    # Perturb rotations by ~1.5 degrees; BA ("_____": rotations only)
    # must pull them back.
    rng = np.random.default_rng(1)
    pert = rodrigues_to_matrix(
        rng.normal(0, 0.015, (4, 3)).astype(np.float32))
    noisy = Cameras(
        focal=true_cams.focal, aspect=true_cams.aspect, ppx=true_cams.ppx,
        ppy=true_cams.ppy,
        R=np.einsum("nij,njk->nik", np.asarray(pert), np.asarray(true_cams.R)),
        t=true_cams.t)

    out = bundle_adjust(noisy, prob, cost_func=cost, refine_mask="_____")
    # Compare relative rotations (global gauge is unconstrained).
    r_t = np.asarray(true_cams.R)
    r_o = np.asarray(out.R)
    errs = []
    for i in range(3):
        rel_t = r_t[i + 1] @ r_t[i].T
        rel_o = r_o[i + 1] @ r_o[i].T
        errs.append(np.abs(rel_o - rel_t).max())
    noisy_err = max(
        np.abs(np.asarray(noisy.R)[i + 1] @ np.asarray(noisy.R)[i].T -
               r_t[i + 1] @ r_t[i].T).max() for i in range(3))
    assert max(errs) < noisy_err * 0.35, (errs, noisy_err)


def _cv2_ba_reproj(cams_init, prob, img_size=(640, 480), conf=3.0):
    """Drive cv2.detail.BundleAdjusterReproj on the same correspondence
    set (the reference's adjuster at image_stitching.cpp:680-713), with
    the reference-default refinement mask "_____" (rotations only)."""
    n = len(cams_init)
    kp_store = [[] for _ in range(n)]
    pair_idx = {}
    for q in range(len(prob.cam_i)):
        if prob.w[q] == 0:
            continue
        i, j = int(prob.cam_i[q]), int(prob.cam_j[q])
        ai = len(kp_store[i])
        kp_store[i].append(tuple(prob.p_i[q]))
        bj = len(kp_store[j])
        kp_store[j].append(tuple(prob.p_j[q]))
        pair_idx.setdefault((i, j), []).append((ai, bj))
    feats = []
    for i in range(n):
        f = cv2.detail.ImageFeatures()
        f.img_idx = i
        f.img_size = img_size
        f.keypoints = [cv2.KeyPoint(float(x), float(y), 7.0)
                       for x, y in kp_store[i]]
        feats.append(f)
    k = np.asarray(cams_init.K(), np.float64)
    r0 = np.asarray(cams_init.R, np.float64)
    pairwise = []
    for i in range(n):
        for j in range(n):
            m = cv2.detail.MatchesInfo()
            m.src_img_idx, m.dst_img_idx = i, j
            if (i, j) in pair_idx:
                idx = pair_idx[(i, j)]
                m.matches = [cv2.DMatch(a, b, 0.0) for a, b in idx]
                m.inliers_mask = np.ones(len(idx), np.uint8)
                m.num_inliers = len(idx)
                m.confidence = conf
                h = k[j] @ r0[j].T @ r0[i] @ np.linalg.inv(k[i])
                m.H = h / h[2, 2]
            else:
                m.confidence = 0.0
            pairwise.append(m)
    cv_cams = []
    for i in range(n):
        c = cv2.detail.CameraParams()
        c.focal = float(cams_init.focal[i])
        c.aspect = float(cams_init.aspect[i])
        c.ppx = float(cams_init.ppx[i])
        c.ppy = float(cams_init.ppy[i])
        c.R = r0[i].astype(np.float32)
        c.t = np.zeros((3, 1), np.float64)
        cv_cams.append(c)
    ba = cv2.detail.BundleAdjusterReproj()
    ba.setConfThresh(1.0)
    ba.setRefinementMask(np.zeros((3, 3), np.uint8))
    ok, cv_out = ba.apply(feats, pairwise, cv_cams)
    assert ok
    return np.stack([c.R.astype(np.float64) for c in cv_out])


def test_bundle_adjust_matches_cv2_adjuster():
    """Oracle parity with cv2.detail.BundleAdjusterReproj on the identical
    correspondence table.  The comparison uses the gauge-invariant relative
    rotation R_j^T R_i (the global gauge is a free left-multiplication both
    solvers may pick differently)."""
    true_cams = ring_cameras(4)
    prob = synth_correspondences(true_cams, n_per_edge=60, noise=0.3,
                                 seed=3)
    rng = np.random.default_rng(1)
    pert = rodrigues_to_matrix(
        rng.normal(0, 0.01, (4, 3)).astype(np.float32))
    init = Cameras(
        focal=true_cams.focal, aspect=true_cams.aspect, ppx=true_cams.ppx,
        ppy=true_cams.ppy,
        R=np.einsum("nij,njk->nik", np.asarray(pert),
                    np.asarray(true_cams.R)).astype(np.float32),
        t=true_cams.t)

    ours = np.asarray(
        bundle_adjust(init, prob, cost_func="reproj",
                      refine_mask="_____").R, np.float64)
    cv_r = _cv2_ba_reproj(init, prob)

    for i in range(3):
        rel_o = ours[i + 1].T @ ours[i]
        rel_c = cv_r[i + 1].T @ cv_r[i]
        d = rel_o @ rel_c.T
        ang = np.degrees(np.arccos(np.clip((np.trace(d) - 1) / 2, -1, 1)))
        assert ang < 0.02, (i, ang)


def test_bundle_adjust_refine_focal():
    true_cams = ring_cameras(4, focal=800.0)
    prob = synth_correspondences(true_cams, n_per_edge=60, noise=0.0)
    bad = Cameras(
        focal=np.asarray(true_cams.focal) * 1.06, aspect=true_cams.aspect,
        ppx=true_cams.ppx, ppy=true_cams.ppy, R=true_cams.R, t=true_cams.t)
    out = bundle_adjust(bad, prob, cost_func="reproj", refine_mask="x____")
    np.testing.assert_allclose(np.asarray(out.focal), 800.0, rtol=0.02)
