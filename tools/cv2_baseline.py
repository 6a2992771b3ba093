"""OpenCV-oracle CPU baseline for BASELINE configs 1-3 (VERDICT r03 #6).

The reference (`/root/reference/image_stitching/image_stitching.cpp`)
publishes no numbers; its pipeline is cv::detail calls.  This script runs
the SAME cv::detail pipeline (the stitching_detailed composition the
reference's main() hand-rolls at `:281-1232`) on the SAME synthetic
capture sets bench.py uses, on CPU, and reports per-config MP/s + stage
seconds — the measured baseline BASELINE.md always promised.

Parity notes (documented deltas):
  * No EXIF-prior seeding: cv2's Python surface can't parse the custom
    ImageDescription payload, so cameras come from
    HomographyBasedEstimator (the reference's own no-prior dead path,
    `image_stitchin3g.cpp:744-823`).  BA then refines nothing
    (refine mask "_____", `image_stitching.cpp:67`), matching the
    reference's default semantics.
  * Feature counts / blend types mirror bench.py's modes so the numbers
    are directly comparable (e2e: 1500 features, spherical, multiband;
    cyl4: cylindrical; vga_pair: feather + p50 latency).

Usage: python tools/cv2_baseline.py [e2e|cyl4|vga_pair|all]
Writes one JSON line per config to stdout; details to stderr.
"""
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import cv2  # noqa: E402  (test oracle ONLY — CLAUDE.md)


def _features(imgs, n_features):
    orb = cv2.ORB_create(nfeatures=n_features, scaleFactor=1.2, nlevels=8,
                         firstLevel=0, WTA_K=2,
                         scoreType=cv2.ORB_HARRIS_SCORE, patchSize=40,
                         fastThreshold=20)
    return [cv2.detail.computeImageFeatures2(orb, im) for im in imgs]


def _make_matcher(match_conf, range_width):
    if range_width > 0:
        return cv2.detail_BestOf2NearestRangeMatcher(range_width, False,
                                                     match_conf)
    return cv2.detail_BestOf2NearestMatcher(False, match_conf)


def _stitch_cv2(images, warp_type, blend_type, n_features=1500,
                match_conf=0.32, conf_thresh=0.95, seam_megapix=0.1,
                compose_megapix=0.4, work_megapix=1.9, range_width=-1):
    """The reference pipeline via cv::detail; returns (pano, stage_times)."""
    t = {}

    def timer(name, t0):
        t[name] = time.perf_counter() - t0
        return time.perf_counter()

    full_hw = images[0].shape[:2]
    area = full_hw[0] * full_hw[1]
    work_scale = min(1.0, math.sqrt(work_megapix * 1e6 / area)) \
        if work_megapix > 0 else 1.0
    seam_scale = min(1.0, math.sqrt(seam_megapix * 1e6 / area))
    compose_scale = min(1.0, math.sqrt(compose_megapix * 1e6 / area)) \
        if compose_megapix > 0 else 1.0
    seam_work_aspect = seam_scale / work_scale

    t0 = time.perf_counter()
    work_imgs = [cv2.resize(im, None, fx=work_scale, fy=work_scale,
                            interpolation=cv2.INTER_LINEAR_EXACT)
                 if work_scale != 1.0 else im for im in images]
    feats = _features(work_imgs, n_features)
    t0 = timer("features", t0)

    matcher = _make_matcher(match_conf, range_width)
    pairwise = matcher.apply2(feats)
    matcher.collectGarbage()
    t0 = timer("matching", t0)

    indices = cv2.detail.leaveBiggestComponent(feats, pairwise, conf_thresh)
    kept = [int(i) for i in np.ravel(np.asarray(indices))]
    if len(kept) < len(feats):
        # The Python binding of leaveBiggestComponent returns indices
        # without filtering `pairwise` (the C++ API erases in place), so a
        # drop leaves stale full-set matches whose empty H lands in the
        # estimator's spanning tree (cv2.error in invert).  Re-match the
        # kept subset; count it as matching time.
        feats = [feats[i] for i in kept]
        t0 = time.perf_counter()
        matcher = _make_matcher(match_conf, range_width)
        pairwise = matcher.apply2(feats)
        matcher.collectGarbage()
        t["matching"] += time.perf_counter() - t0
        t0 = time.perf_counter()
    else:
        feats = [feats[i] for i in kept]
    images_k = [images[i] for i in kept]

    estimator = cv2.detail_HomographyBasedEstimator()
    ok, cameras = estimator.apply(feats, pairwise, None)
    assert ok, "estimator failed"
    for cam in cameras:
        cam.R = cam.R.astype(np.float32)
    adjuster = cv2.detail_BundleAdjusterReproj()
    adjuster.setConfThresh(conf_thresh)
    # "_____": refine nothing (image_stitching.cpp:67) — BA validates and
    # passes the estimator seed through, like the reference default.
    adjuster.setRefinementMask(np.zeros((3, 3), np.uint8))
    ok, cameras = adjuster.apply(feats, pairwise, cameras)
    assert ok, "BA failed"
    rmats = [np.copy(c.R) for c in cameras]
    rmats = cv2.detail.waveCorrect(rmats, cv2.detail.WAVE_CORRECT_HORIZ)
    for c, r in zip(cameras, rmats):
        c.R = r
    t0 = timer("ba", t0)

    scale = float(np.median([c.focal for c in cameras]))
    warper = cv2.PyRotationWarper(warp_type, scale * seam_work_aspect)
    seam_imgs = [cv2.resize(im, None, fx=seam_scale, fy=seam_scale,
                            interpolation=cv2.INTER_LINEAR_EXACT)
                 for im in images_k]
    corners, sizes, imgs_warped, masks_warped = [], [], [], []
    for im, cam in zip(seam_imgs, cameras):
        k = cam.K().astype(np.float32)
        k[0, :] *= seam_work_aspect
        k[1, :] *= seam_work_aspect
        corner, iw = warper.warp(im, k, cam.R, cv2.INTER_LINEAR,
                                 cv2.BORDER_REFLECT)
        mask = np.full(im.shape[:2], 255, np.uint8)
        _, mw = warper.warp(mask, k, cam.R, cv2.INTER_NEAREST,
                            cv2.BORDER_CONSTANT)
        corners.append(corner)
        sizes.append((iw.shape[1], iw.shape[0]))
        imgs_warped.append(iw)
        masks_warped.append(mw)
    t0 = timer("warp", t0)

    comp = cv2.detail.ExposureCompensator_createDefault(
        cv2.detail.ExposureCompensator_GAIN_BLOCKS)
    comp.feed(corners=corners, images=imgs_warped, masks=masks_warped)
    t0 = timer("exposure", t0)

    seam_finder = cv2.detail_DpSeamFinder("COLOR")
    masks_warped = seam_finder.find(
        [iw.astype(np.float32) for iw in imgs_warped], corners,
        masks_warped)
    masks_warped = [np.asarray(cv2.UMat.get(m) if isinstance(m, cv2.UMat)
                               else m) for m in masks_warped]
    t0 = timer("seams", t0)

    # Compose at compose scale.
    cwa = compose_scale / work_scale
    warper = cv2.PyRotationWarper(warp_type, scale * cwa)
    blender = None
    for idx, (im, cam) in enumerate(zip(images_k, cameras)):
        cim = cv2.resize(im, None, fx=compose_scale, fy=compose_scale,
                         interpolation=cv2.INTER_LINEAR_EXACT) \
            if abs(compose_scale - 1) > 1e-1 else im
        k = cam.K().astype(np.float32)
        k[0, :] *= cwa
        k[1, :] *= cwa
        corner, iw = warper.warp(cim, k, cam.R, cv2.INTER_LINEAR,
                                 cv2.BORDER_REFLECT)
        mask = np.full(cim.shape[:2], 255, np.uint8)
        _, mw = warper.warp(mask, k, cam.R, cv2.INTER_NEAREST,
                            cv2.BORDER_CONSTANT)
        comp.apply(idx, corner, iw, mw)
        seam_m = cv2.dilate(masks_warped[idx], None)
        seam_m = cv2.resize(seam_m, (mw.shape[1], mw.shape[0]),
                            interpolation=cv2.INTER_LINEAR_EXACT)
        mw = cv2.bitwise_and(seam_m, mw)
        if blender is None:
            rois = []
            for im2, cam2 in zip(images_k, cameras):
                h2 = int(round(im2.shape[0] * compose_scale))
                w2 = int(round(im2.shape[1] * compose_scale))
                k2 = cam2.K().astype(np.float32)
                k2[0, :] *= cwa
                k2[1, :] *= cwa
                rois.append(warper.warpRoi((w2, h2), k2, cam2.R))
            dst = cv2.detail.resultRoi(
                corners=[(r[0], r[1]) for r in rois],
                sizes=[(r[2], r[3]) for r in rois])
            blend_width = math.sqrt(dst[2] * dst[3]) * 5.0 / 100.0
            if blend_type == "feather" or blend_width < 1:
                blender = cv2.detail_FeatherBlender()
                blender.setSharpness(1.0 / blend_width
                                     if blend_width >= 1 else 0.02)
            else:
                blender = cv2.detail_MultiBandBlender()
                blender.setNumBands(
                    max(int(math.ceil(math.log2(blend_width)) - 1), 1))
            blender.prepare(dst)
        blender.feed(iw.astype(np.int16), mw, corner)
    pano, _ = blender.blend(None, None)
    timer("composite", t0)
    return pano, kept, t


def _load_bench_dir(d):
    import glob
    paths = sorted(glob.glob(os.path.join(d, "*.jpg")),
                   key=lambda p: int(os.path.basename(p).split(".")[0]))
    return [cv2.imread(p) for p in paths]


def _ensure_bench_dirs(mode):
    """Reuse bench.py's cached synthetic capture dirs (same content)."""
    from image_stitching_tpu.data.synth import (make_rig_captures,
                                                make_ring_captures,
                                                write_capture_dir)
    cache_root = os.path.expanduser("~/.cache/stitch_bench")
    specs = {
        "e2e": [(f"caps_8x2448x3264_s{s}",
                 dict(n_images=8, hw=(2448, 3264), fov_deg=55,
                      overlap_ratio=0.5, seed=s)) for s in (5, 6)],
        "cyl4": [(f"cyl4_s{s}",
                  dict(n_images=4, hw=(1080, 1920), fov_deg=55,
                       overlap_ratio=0.45, seed=s)) for s in (11, 13)],
        "vga_pair": [(f"vga2_s{s}",
                      dict(n_images=2, hw=(480, 640), fov_deg=55,
                           overlap_ratio=0.5, seed=100 + s))
                     for s in range(1, 6)],
        # The reference's flagship 5-ring 37-image rig and the 100-tile
        # mosaic (bench.py rig37 / mosaic100 modes, SAME capture content).
        "rig37": [("rig37_960x1280_s21",
                   dict(_rig=True, hw=(960, 1280), seed=21))],
        "mosaic100": [("mosaic100_480x640_s31",
                       dict(n_images=100, hw=(480, 640), fov_deg=8,
                            overlap_ratio=0.55, seed=31,
                            texture_detail=True))],
    }[mode]
    dirs = []
    for name, kw in specs:
        d = os.path.join(cache_root, name)
        if not os.path.isdir(d):
            if kw.pop("_rig", False):
                images, k, rs = make_rig_captures(**kw)
            else:
                images, k, rs = make_ring_captures(**kw)
            write_capture_dir(d, images, k, rs)
        dirs.append(d)
    return dirs


def run_mode(mode):
    dirs = _ensure_bench_dirs(mode)
    cfgs = {
        "e2e": dict(warp_type="spherical", blend_type="multiband"),
        "cyl4": dict(warp_type="cylindrical", blend_type="multiband"),
        "vga_pair": dict(warp_type="spherical", blend_type="feather",
                         work_megapix=-1, compose_megapix=-1),
        # bench.py::_bench_rig37 — StitchConfig(num_features=1000)
        # defaults: full-res work scale, spherical, multiband, DP seam.
        # Documented delta: no EXIF priors through cv2 (HomographyBased
        # estimator seeds instead — the reference's own no-prior path).
        "rig37": dict(warp_type="spherical", blend_type="multiband",
                      n_features=1000, work_megapix=-1),
        # bench.py::_bench_mosaic100 — FULL reference defaults: 4000
        # features, GAIN_BLOCKS, BestOf2NearestRange(3).
        "mosaic100": dict(warp_type="spherical", blend_type="multiband",
                          n_features=4000, work_megapix=-1,
                          range_width=3),
    }[mode]
    lats, stages, mps = [], {}, []
    kept_n = 0
    for d in dirs:
        imgs = _load_bench_dir(d)
        t0 = time.perf_counter()
        pano, kept, st = _stitch_cv2(imgs, **cfgs)
        lats.append(time.perf_counter() - t0)
        kept_n = len(kept)
        mp = sum(imgs[i].shape[0] * imgs[i].shape[1] for i in kept) / 1e6
        mps.append(mp / lats[-1])
        for k2, v in st.items():
            stages.setdefault(k2, []).append(v)
    stage_p50 = {k2: round(float(np.median(v)), 3)
                 for k2, v in stages.items()}
    print(f"# cv2 {mode}: kept {kept_n}, runs "
          + ", ".join(f"{x:.2f}s" for x in lats)
          + f", stages(p50 s) {stage_p50}", file=sys.stderr)
    if mode == "vga_pair":
        return {"metric": "cv2_vga_pair_stitch_latency",
                "value": round(float(np.percentile(lats, 50)) * 1e3, 1),
                "unit": "ms_p50", "hardware": "container CPU (1 core)"}
    return {"metric": f"cv2_{mode}_throughput",
            "value": round(float(np.max(mps)), 3),
            "value_p50": round(float(np.median(mps)), 3),
            "unit": "MP/s", "hardware": "container CPU (1 core)",
            "stages_p50_s": stage_p50}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    modes = (["vga_pair", "cyl4", "e2e", "rig37", "mosaic100"]
             if which == "all" else [which])
    for m in modes:
        print(json.dumps(run_mode(m)))
        sys.stdout.flush()
