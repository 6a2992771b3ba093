"""Tests for the affine pipeline mode, pose infill, and match-graph DOT."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_stitching_tpu.estimation import (affine_based_estimate,
                                            bundle_adjust,
                                            infill_dropped_cameras,
                                            matches_graph_dot,
                                            pack_correspondences)
from image_stitching_tpu.geometry.camera import Cameras
from image_stitching_tpu.ops.features import Features, orb_detect_and_describe
from image_stitching_tpu.ops.matching import match_all_pairs


@pytest.fixture(scope="module")
def affine_scene():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (50, 60)).astype(np.float32)
    img1 = cv2.resize(base, (256, 192), interpolation=cv2.INTER_CUBIC)
    ang, s = 0.1, 1.05
    a = np.float32([[s * np.cos(ang), -s * np.sin(ang), 15],
                    [s * np.sin(ang), s * np.cos(ang), -5]])
    img2 = cv2.warpAffine(img1, a, (256, 192))
    h_true = np.eye(3, dtype=np.float64)
    h_true[:2] = a
    f1 = orb_detect_and_describe(img1, n_features=300)
    f2 = orb_detect_and_describe(img2, n_features=300)
    fs = Features.stack([f1, f2])
    pm = match_all_pairs(fs, jax.random.PRNGKey(0), match_conf=0.3,
                         matcher_type="affine", n_hyp=256)
    return fs, jax.tree.map(np.asarray, pm), h_true


def test_affine_estimate_and_ba(affine_scene):
    fs, pm, h_true = affine_scene
    assert pm.confidence[0, 1] > 1.0
    cams = affine_based_estimate(pm, [(192, 256)] * 2, 0.3)
    prob = pack_correspondences(fs, pm, 0.3)
    out = bundle_adjust(cams, prob, cost_func="affine")
    expected = np.linalg.inv(h_true)
    got = np.asarray(out.R)[1]
    np.testing.assert_allclose(got[:2, :2], expected[:2, :2], atol=0.01)
    np.testing.assert_allclose(got[:2, 2], expected[:2, 2], atol=1.5)


def test_bundle_adjust_affine_requires_problem(affine_scene):
    fs, pm, _ = affine_scene
    cams = affine_based_estimate(pm, [(192, 256)] * 2, 0.3)
    out = bundle_adjust(cams, None, cost_func="affine")
    np.testing.assert_array_equal(np.asarray(out.R), np.asarray(cams.R))


def test_pose_infill():
    from scipy.spatial.transform import Rotation as SR
    n = 6
    rng = np.random.default_rng(0)
    rs_prior = np.stack([
        SR.from_euler("y", 0.3 * i).as_matrix().astype(np.float32)
        for i in range(n)])
    priors = Cameras(
        focal=np.full(n, 500.0, np.float32), aspect=np.ones(n, np.float32),
        ppx=np.full(n, 320.0, np.float32), ppy=np.full(n, 240.0, np.float32),
        R=rs_prior, t=np.zeros((n, 3), np.float32))
    # Refined = priors rotated by a global gauge G, cameras 0,1,2,4 kept.
    g = SR.from_euler("z", 0.05).as_matrix().astype(np.float32)
    kept = [0, 1, 2, 4]
    refined = Cameras(
        focal=np.full(len(kept), 510.0, np.float32),
        aspect=np.ones(len(kept), np.float32),
        ppx=np.full(len(kept), 321.0, np.float32),
        ppy=np.full(len(kept), 241.0, np.float32),
        R=np.stack([g @ rs_prior[i] for i in kept]),
        t=np.zeros((len(kept), 3), np.float32))
    full = infill_dropped_cameras(priors, refined, kept, rig=None)
    assert len(full) == n
    # Kept slots carry the refined values verbatim.
    np.testing.assert_allclose(np.asarray(full.R)[0], g @ rs_prior[0],
                               atol=1e-6)
    assert float(np.asarray(full.focal)[3]) == 510.0
    # Infilled camera 3: refined neighbor + prior delta should land close
    # to g @ prior_3 (same gauge), up to the roll-zeroing of the recipe.
    got = np.asarray(full.R)[3]
    want = g @ rs_prior[3]
    ang = np.degrees(np.arccos(np.clip((np.trace(got @ want.T) - 1) / 2,
                                       -1, 1)))
    assert ang < 4.0, ang


def test_matches_graph_dot():
    conf = np.zeros((3, 3))
    conf[0, 1] = conf[1, 0] = 1.2
    inl = np.full((3, 3), 7)
    nm = np.full((3, 3), 9)
    dot = matches_graph_dot(["/a/x.jpg", "y.jpg", "z.jpg"], conf, inl, nm,
                            0.95)
    assert dot.startswith("graph matches_graph {")
    assert '"x.jpg" -- "y.jpg"' in dot
    assert 'Nm=9, Ni=7' in dot
    assert '"z.jpg";' in dot  # isolated node listed
