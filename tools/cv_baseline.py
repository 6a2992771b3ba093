"""OpenCV-oracle CPU baseline for BASELINE.json configs 1-3.

The reference (a1q123456/image_stitching) publishes no numbers and its
samples.zip is an unmaterialized LFS pointer (BASELINE.md), so this
script IS the measured baseline: a faithful cv2.detail mirror of the
reference's `main()` (`image_stitching/image_stitching.cpp:281-1232`,
which delegates every stage to cv::detail) run on the SAME cached
synthetic capture dirs bench.py uses, with the SAME knob values bench.py
passes to StitchConfig.  cv2 is the test oracle only (CLAUDE.md); this
tool never runs in the pipeline.

Stages mirrored (reference line refs): ORB features (:545), BestOf2Nearest
(:643), leaveBiggestComponent (:663), HomographyBasedEstimator (:683),
BundleAdjuster{Reproj,Ray} + "_____" refine mask (:702-741), waveCorrect
(:881), spherical/cylindrical warp (:930-993), BlocksGainCompensator
(:1002), DpSeamFinder COLOR (:1032), MultiBand/Feather blend (:1120-1227).

Usage: python tools/cv_baseline.py [vga_pair|cyl4|e2e|pair_lat|all]
Writes one JSON line per mode (stderr carries stage breakdowns).
"""
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cv2  # noqa: E402

CACHE = os.path.expanduser("~/.cache/stitch_bench")


def _ensure_dirs():
    """Materialize bench.py's capture dirs (identical seeds/paths)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from image_stitching_tpu.data.synth import (make_ring_captures,
                                                write_capture_dir)
    specs = []
    for seed in range(6):
        specs.append((f"vga2_s{seed}",
                      dict(n_images=2, hw=(480, 640), fov_deg=55,
                           overlap_ratio=0.5, seed=100 + seed)))
    for seed in (11, 12, 13, 14):
        specs.append((f"cyl4_s{seed}",
                      dict(n_images=4, hw=(1080, 1920), fov_deg=55,
                           overlap_ratio=0.45, seed=seed)))
    for seed in (5, 6, 7, 8):
        specs.append((f"caps_8x2448x3264_s{seed}",
                      dict(n_images=8, hw=(2448, 3264), fov_deg=55,
                           overlap_ratio=0.5, seed=seed)))
    for name, kw in specs:
        d = os.path.join(CACHE, name)
        if not (os.path.isdir(d) and os.path.exists(
                os.path.join(d, "gt.npz"))):
            images, k, rs = make_ring_captures(**kw)
            write_capture_dir(d, images, k, rs)
            np.savez(os.path.join(d, "gt.npz"), k=k, rs=np.stack(rs))


def _jpegs(d):
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.lower().endswith((".jpg", ".jpeg", ".png")))


def cv_stitch(paths, *, n_features=1500, warp_type="spherical",
              blend="multiband", work_megapix=-1.0, seam_megapix=0.1,
              compose_megapix=0.4, match_conf=0.32, conf_thresh=0.95,
              ba="reproj", stage_times=None):
    """The reference main() in cv2.detail; returns (pano, cameras, kept)."""
    t = {}

    def tic(name):
        t[name] = time.perf_counter()

    def toc(name):
        if stage_times is not None:
            stage_times[name] = stage_times.get(name, 0.0) + (
                time.perf_counter() - t[name])

    tic("find")
    full_imgs = [cv2.imread(p) for p in paths]
    full_hw = full_imgs[0].shape[:2]
    area = full_hw[0] * full_hw[1]
    work_scale = (1.0 if work_megapix <= 0 else
                  min(1.0, math.sqrt(work_megapix * 1e6 / area)))
    seam_scale = min(1.0, math.sqrt(seam_megapix * 1e6 / area))
    seam_work_aspect = seam_scale / work_scale
    finder = cv2.ORB_create(nfeatures=n_features)
    feats, seam_imgs = [], []
    for im in full_imgs:
        w = (im if work_scale == 1.0 else
             cv2.resize(im, None, fx=work_scale, fy=work_scale,
                        interpolation=cv2.INTER_LINEAR_EXACT))
        feats.append(cv2.detail.computeImageFeatures2(finder, w))
        seam_imgs.append(cv2.resize(im, None, fx=seam_scale, fy=seam_scale,
                                    interpolation=cv2.INTER_LINEAR_EXACT))
    toc("find")

    tic("match")
    matcher = cv2.detail_BestOf2NearestMatcher(False, match_conf)
    pw = matcher.apply2(feats)
    matcher.collectGarbage()
    toc("match")

    tic("register")
    kept = cv2.detail.leaveBiggestComponent(feats, pw, conf_thresh)
    kept = [int(i) for i in np.asarray(kept).ravel()]
    estimator = cv2.detail_HomographyBasedEstimator()
    ok, cams = estimator.apply(feats, pw, None)
    assert ok, "homography estimation failed"
    for c in cams:
        c.R = c.R.astype(np.float32)
    adj = (cv2.detail_BundleAdjusterRay() if ba == "ray"
           else cv2.detail_BundleAdjusterReproj())
    adj.setConfThresh(conf_thresh)
    # "_____" refine mask (:66): all intrinsics frozen, rotations only.
    adj.setRefinementMask(np.zeros((3, 3), np.uint8))
    ok, cams = adj.apply(feats, pw, cams)
    assert ok, "bundle adjustment failed"
    rmats = [np.copy(c.R) for c in cams]
    rmats = cv2.detail.waveCorrect(rmats, cv2.detail.WAVE_CORRECT_HORIZ)
    for c, r in zip(cams, rmats):
        c.R = r
    toc("register")

    tic("warp")
    focals = sorted(c.focal for c in cams)
    n = len(cams)
    scale = (focals[n // 2] if n % 2 else
             0.5 * (focals[n // 2 - 1] + focals[n // 2]))
    warper = cv2.PyRotationWarper(warp_type, scale * seam_work_aspect)
    corners, masks_warped, imgs_warped = [], [], []
    for i, im in enumerate(seam_imgs):
        K = cams[i].K().astype(np.float32)
        K[0, :] *= seam_work_aspect
        K[1, :] *= seam_work_aspect
        c, iw = warper.warp(im, K, cams[i].R, cv2.INTER_LINEAR,
                            cv2.BORDER_REFLECT)
        mask = 255 * np.ones(im.shape[:2], np.uint8)
        _, mw = warper.warp(mask, K, cams[i].R, cv2.INTER_NEAREST,
                            cv2.BORDER_CONSTANT)
        corners.append(c)
        imgs_warped.append(iw)
        masks_warped.append(mw)
    toc("warp")

    tic("exposure")
    comp = cv2.detail.ExposureCompensator_createDefault(
        cv2.detail.ExposureCompensator_GAIN_BLOCKS)
    comp.feed(corners=corners, images=imgs_warped, masks=masks_warped)
    toc("exposure")

    tic("seam")
    seam_finder = cv2.detail_DpSeamFinder("COLOR")
    imgs_f = [iw.astype(np.float32) for iw in imgs_warped]
    masks_warped = seam_finder.find(imgs_f, corners, masks_warped)
    toc("seam")

    tic("compose")
    compose_scale = (1.0 if compose_megapix <= 0 else
                     min(1.0, math.sqrt(compose_megapix * 1e6 / area)))
    compose_work_aspect = compose_scale / work_scale
    warper = cv2.PyRotationWarper(warp_type, scale * compose_work_aspect)
    blender = None
    for i, im in enumerate(full_imgs):
        img = (im if compose_scale == 1.0 else
               cv2.resize(im, None, fx=compose_scale, fy=compose_scale,
                          interpolation=cv2.INTER_LINEAR_EXACT))
        K = cams[i].K().astype(np.float32)
        K[0, :] *= compose_work_aspect
        K[1, :] *= compose_work_aspect
        corner, img_w = warper.warp(img, K, cams[i].R, cv2.INTER_LINEAR,
                                    cv2.BORDER_REFLECT)
        mask = 255 * np.ones(img.shape[:2], np.uint8)
        _, mask_w = warper.warp(mask, K, cams[i].R, cv2.INTER_NEAREST,
                                cv2.BORDER_CONSTANT)
        comp.apply(i, corner, img_w, mask_w)
        # dilate + resize the seam mask up to compose scale (:1180-1190)
        dil = cv2.dilate(masks_warped[i], None)
        seam_mask = cv2.resize(dil, (mask_w.shape[1], mask_w.shape[0]),
                               interpolation=cv2.INTER_LINEAR_EXACT)
        mask_w = cv2.bitwise_and(seam_mask, mask_w)
        if blender is None:
            # result ROI over ALL images' warped rois (:1155-1160)
            all_c, all_s = [], []
            for j, im2 in enumerate(full_imgs):
                K2 = cams[j].K().astype(np.float32)
                K2[0, :] *= compose_work_aspect
                K2[1, :] *= compose_work_aspect
                sz = (int(round(im2.shape[1] * compose_scale)),
                      int(round(im2.shape[0] * compose_scale)))
                roi = warper.warpRoi(sz, K2, cams[j].R)
                all_c.append((roi[0], roi[1]))
                all_s.append((roi[2], roi[3]))
            dst_roi = cv2.detail.resultRoi(corners=all_c, sizes=all_s)
            if blend == "multiband":
                blender = cv2.detail_MultiBandBlender()
                blend_width = math.sqrt(dst_roi[2] * dst_roi[3]) * 5.0 / 100
                blender.setNumBands(
                    max(0, int(math.log(blend_width) / math.log(2.0) - 1)))
            else:
                blender = cv2.detail_FeatherBlender()
            blender.prepare(dst_roi)
        blender.feed(img_w.astype(np.int16), mask_w, corner)
    pano, _ = blender.blend(None, None)
    toc("compose")
    return pano, cams, kept


def _run_mode(dirs_warm, dirs_timed, hw, label, **kw):
    st = {}
    cv_stitch(_jpegs(dirs_warm), stage_times={}, **kw)   # warm (io caches)
    thr, lat = [], []
    for d in dirs_timed:
        st_run = {}
        t0 = time.perf_counter()
        pano, cams, kept = cv_stitch(_jpegs(d), stage_times=st_run, **kw)
        dt = time.perf_counter() - t0
        lat.append(dt)
        thr.append(len(kept) * hw[0] * hw[1] / 1e6 / dt)
        for k, v in st_run.items():
            st.setdefault(k, []).append(v)
    print(f"# {label} stage p50 s: " + ", ".join(
        f"{k}={np.percentile(v, 50):.3f}" for k, v in st.items()),
        file=sys.stderr)
    return {
        "mode": label,
        "value": round(float(max(thr)), 3),
        "value_p50": round(float(np.median(thr)), 3),
        "unit": "MP/s",
        "latency_p50_ms": round(float(np.median(lat)) * 1e3, 1),
        "oracle": f"opencv-{cv2.__version__}-cpu",
    }


def bench_vga_pair():
    dirs = [os.path.join(CACHE, f"vga2_s{s}") for s in range(6)]
    return _run_mode(dirs[0], dirs[1:], (480, 640), "vga_pair",
                     n_features=1500, blend="feather")


def bench_cyl4():
    dirs = {s: os.path.join(CACHE, f"cyl4_s{s}") for s in (11, 12, 13, 14)}
    return _run_mode(dirs[12], [dirs[s] for s in (11, 13, 14)],
                     (1080, 1920), "cyl4", n_features=1500,
                     warp_type="cylindrical")


def bench_e2e():
    dirs = {s: os.path.join(CACHE, f"caps_8x2448x3264_s{s}")
            for s in (5, 6, 7, 8)}
    return _run_mode(dirs[8], [dirs[s] for s in (7, 6, 5)],
                     (2448, 3264), "e2e_8x8mp", n_features=1500,
                     work_megapix=1.9)


def bench_pair_lat(trials=20):
    """Single-pair register p50 (detect+match+RANSAC H), VGA."""
    d = os.path.join(CACHE, "vga2_s1")
    imgs = [cv2.imread(p) for p in _jpegs(d)]
    orb = cv2.ORB_create(nfeatures=1500)
    lat = []
    for i in range(trials + 2):
        # fresh content each trial: the oracle must not cache either
        a = np.clip(imgs[0].astype(np.int16) + (i % 7), 0, 255).astype(
            np.uint8)
        b = np.clip(imgs[1].astype(np.int16) + (i % 5), 0, 255).astype(
            np.uint8)
        t0 = time.perf_counter()
        f = [cv2.detail.computeImageFeatures2(orb, x) for x in (a, b)]
        matcher = cv2.detail_BestOf2NearestMatcher(False, 0.32)
        matcher.apply2(f)
        lat.append(time.perf_counter() - t0)
    return {"mode": "pair_latency", "value":
            round(float(np.percentile(lat[2:], 50)) * 1e3, 2),
            "unit": "ms_p50", "oracle": f"opencv-{cv2.__version__}-cpu"}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    _ensure_dirs()
    fns = {"vga_pair": bench_vga_pair, "cyl4": bench_cyl4,
           "e2e": bench_e2e, "pair_lat": bench_pair_lat}
    run = fns.values() if which == "all" else [fns[which]]
    out = [f() for f in run]
    for r in out:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
