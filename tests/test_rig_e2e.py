"""End-to-end stitch of the reference's actual 37-image 5-ring rig.

The flagship scenario: captures rendered at the rig's own rotation priors
(`image_stitching.cpp:96-102` table), EXIF payloads carrying the poses,
full default pipeline (spherical warp, GAIN_BLOCKS, dp_color seams,
multiband blend).  Uses the first two rings (20 images) at small
resolution to stay within the 1-core CPU budget; the full 37-image set is
exercised on TPU by benchmarks.
"""

import os

import numpy as np
import pytest

from image_stitching_tpu.config import StitchConfig
from image_stitching_tpu.core.rig import DEFAULT_RIG
from image_stitching_tpu.data.synth import make_rig_captures, write_capture_dir
from image_stitching_tpu.pipeline.stitcher import stitch

N_IMAGES = 20  # rings 0 (11 imgs @ pitch 0) and 1 (9 imgs @ pitch 34)


@pytest.mark.slow
def test_rig_two_rings_stitch(tmp_path):
    images, k, rs = make_rig_captures(hw=(180, 240), fov_deg=68.0,
                                      n_images=N_IMAGES)
    d = tmp_path / "caps"
    write_capture_dir(str(d), images, k, rs)
    os.chdir(tmp_path)
    # Reference-default conf_thresh 0.95: spurious repetitive-texture pairs
    # (conf ~0.5-0.85) are rejected, exactly as the reference would.
    cfg = StitchConfig(num_features=600, compose_megapix=-1,
                       seam_megapix=0.03,
                       checkpoint_dir=str(tmp_path), infill_dropped=True)
    res = stitch(str(d), cfg, output=str(tmp_path / "rig.jpg"))
    # With infill enabled every camera comes back.
    assert len(res.kept_indices) == N_IMAGES
    # A ~360 x ~100 deg panorama: aspect ratio far wider than tall.
    h, w = res.panorama.shape[:2]
    assert w > 1.8 * h, (w, h)
    assert res.mask.mean() > 0.5
    # Rotation sanity on the ring-0 cameras that BA kept confident.
    rc = np.asarray(res.cameras.R)
    errs = []
    for i in range(10):
        rel_t = rs[i + 1] @ rs[i].T
        rel_e = rc[i + 1] @ rc[i].T
        errs.append(np.degrees(np.arccos(np.clip(
            (np.trace(rel_e @ rel_t.T) - 1) / 2, -1, 1))))
    assert np.median(errs) < 1.5, errs
