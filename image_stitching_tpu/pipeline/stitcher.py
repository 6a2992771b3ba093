"""End-to-end stitching pipeline: the reference's `main()` as a library.

Stage-for-stage port of the orchestration (NOT the algorithms — those are
the TPU-native ops) at `/root/reference/image_stitching/image_stitching.cpp:281-1232`:

  ingest+priors (:306-528) -> features (:542-622) -> match (:642-655) ->
  biggest component (:661) -> bundle adjust (:680-716) -> checkpoint
  (:714-720) -> wave correct (:721-729) -> median focal (:884-895) ->
  seam-scale warp (:975-989) -> exposure feed (:1002-1023) -> seam find
  (:1032-1065) -> compose-scale warp + exposure apply + mask merge +
  blend (:1086-1225) -> result [-> optional crop: the reference's dangling
  cropper API, wired behind config.crop_result].

The work/seam/compose three-scale scheme and every default match the
reference's config block (:50-85).
"""

from __future__ import annotations

import dataclasses
import os
import types
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BlenderType, StitchConfig, TimelapserType
from ..core import exif as exif_mod
from ..core import image_io, persistence
from ..core.logging import logger, stage_timer
from ..core.transfer import fetch_tree
from ..estimation import (biggest_component, bundle_adjust,
                          homography_based_estimate, pack_correspondences,
                          wave_correct)
from ..geometry.camera import Cameras
from ..ops import exposure as exposure_mod
from ..ops import seams as seams_mod
from ..ops.blend import make_blender
from ..ops.crop import crop as crop_fn
from ..ops.features import Features, orb_detect_and_describe
from ..ops.features.sift import sift_detect_and_describe
from ..ops.imgproc import dilate3, resize, rgb_to_gray, scale_size
from ..ops.matching import match_all_pairs
from ..ops.timelapse import Timelapser, fixed_name
from ..ops.warps import make_warper

__all__ = ["stitch", "StitchResult", "detect_features"]


@dataclasses.dataclass
class StitchResult:
    panorama: np.ndarray                 # float32 HWC RGB
    mask: np.ndarray                     # bool HW
    kept_indices: List[int]
    cameras: Cameras
    stage_times: Dict[str, float]
    timelapse_frames: List[str] = dataclasses.field(default_factory=list)
    work_scale: float = 1.0          # the ACTUAL work scale used (after
                                     # work_scale_snap); cameras are at
                                     # this scale (reference semantics,
                                     # image_stitching.cpp:626-638)


def detect_features(gray, cfg: StitchConfig) -> Features:
    """Feature-family dispatch (`image_stitching.cpp:542-565`); unknown
    types raise with the reference's message."""
    if cfg.features_type == "orb":
        return orb_detect_and_describe(gray, n_features=cfg.num_features,
                                       pattern=cfg.orb_pattern)
    if cfg.features_type == "sift":
        return sift_detect_and_describe(gray, n_features=cfg.num_features)
    if cfg.features_type in ("akaze", "surf"):
        from ..ops.features.akaze import akaze_detect_and_describe
        from ..ops.features.surf import surf_detect_and_describe
        fn = (akaze_detect_and_describe if cfg.features_type == "akaze"
              else surf_detect_and_describe)
        return fn(gray, n_features=cfg.num_features)
    raise ValueError(f"Unknown 2D features type: '{cfg.features_type}'.")


def _load_priors(paths: Sequence[str]):
    """EXIF ingestion loop (`:340-528`).  Returns (cameras | None,
    is_portrait).  is_portrait is the reference's sticky last-image global
    (`:526`)."""
    cams = []
    is_portrait = False
    any_prior = False
    for p in paths:
        desc = exif_mod.read_image_description(p)
        if desc is None:
            cams.append(None)
            continue
        try:
            prior = exif_mod.parse_image_description(desc)
        except (ValueError, IndexError):
            cams.append(None)
            continue
        any_prior = True
        is_portrait = prior.is_portrait
        cams.append(exif_mod.sensor_prior_to_camera(prior))
    if not any_prior:
        return None, False
    # Fill missing priors with identity (reference would produce default
    # CameraParams for EXIF-less images).
    focal, aspect, ppx, ppy, rs, ts = [], [], [], [], [], []
    for c in cams:
        if c is None:
            focal.append(1.0)
            aspect.append(1.0)
            ppx.append(0.0)
            ppy.append(0.0)
            rs.append(np.eye(3, dtype=np.float32))
            ts.append(np.zeros(3, np.float32))
        else:
            f, a, px, py, r, t = c
            focal.append(f)
            aspect.append(a)
            ppx.append(px)
            ppy.append(py)
            rs.append(r)
            ts.append(t)
    return Cameras(
        focal=np.asarray(focal, np.float32),
        aspect=np.asarray(aspect, np.float32),
        ppx=np.asarray(ppx, np.float32),
        ppy=np.asarray(ppy, np.float32),
        R=np.stack(rs), t=np.stack(ts)), is_portrait


def _median_focal(focals: np.ndarray) -> float:
    """`:884-895`: sorted middle (odd) / mean of middle two (even)."""
    f = np.sort(np.asarray(focals, np.float64))
    n = len(f)
    if n % 2 == 1:
        return float(f[n // 2])
    return float(f[n // 2 - 1] + f[n // 2]) * 0.5


# Shape/config sets already run in this process: first contact with a
# new set fences per stage (see core/logging.fenced_stages) — the axon
# worker reproducibly crashes (UNAVAILABLE) when new programs compile
# through the tunnel under a deep async dispatch queue.  Subsequent runs
# (warm persistent compile cache) go fully async.
_WARMED: set = set()


def stitch(source, cfg: StitchConfig = StitchConfig(),
           output: Optional[str] = None) -> StitchResult:
    """Stitch a directory path or a list of image paths.

    Writes `cfg.result_name` (or `output`) like the reference when `output`
    is not explicitly disabled with output="".
    """
    if isinstance(source, str):
        src_paths = image_io.list_images(source)
    else:
        src_paths = list(source)
    if jax.default_backend() == "tpu":
        try:
            first = (image_io.probe_oriented_size(src_paths[0], False)
                     if src_paths else (0, 0))
        except Exception:
            first = (0, 0)
        key = (len(src_paths), first, cfg.work_megapix, cfg.seam_megapix,
               cfg.compose_megapix, cfg.features_type, cfg.num_features,
               cfg.blend_type, cfg.warp_type, cfg.seam_find_type,
               cfg.expos_comp_type, cfg.matcher_type, cfg.estimator_type,
               cfg.ba_cost_func, cfg.timelapse)
        if key not in _WARMED:
            from ..core.logging import fenced_stages
            with fenced_stages():
                out = _stitch_body(src_paths, cfg, output)
            _WARMED.add(key)
            return out
    return _stitch_body(src_paths, cfg, output)


def _stitch_body(source, cfg: StitchConfig,
                 output: Optional[str]) -> StitchResult:
    times: Dict[str, float] = {}
    profiler_on = bool(cfg.profile_dir)
    if profiler_on:
        jax.profiler.start_trace(cfg.profile_dir)
    if isinstance(source, str):
        paths = image_io.list_images(source)
    else:
        paths = list(source)
    if len(paths) < 2:
        raise ValueError("Need at least two images to stitch")

    # ---- ingestion + sensor priors (:306-528) ----
    fast = None
    with stage_timer("Reading images and priors", times):
        if cfg.use_sensor_priors:
            priors, is_portrait = _load_priors(paths)
        else:
            priors, is_portrait = None, False

        # Header-only size probe -> the three-scale scheme (:589-609,
        # :1105-1117) is known BEFORE any pixel decode, so the decoder can
        # run luma-only / DCT-scaled (pipeline/ingest.py).
        full_sizes = [image_io.probe_oriented_size(p, is_portrait)
                      for p in paths]                      # (w, h)
        area0 = full_sizes[0][0] * full_sizes[0][1]
        work_scale = 1.0 if cfg.work_megapix < 0 else min(
            1.0, float(np.sqrt(cfg.work_megapix * 1e6 / area0)))
        if cfg.work_scale_snap and work_scale < 1.0:
            # Snap UP to the decoder's num8/8 grid (never below the
            # requested work_megapix): the detection luma then decodes
            # exactly at work scale — no device resize, and the raw-plane
            # single-pass decode (pipeline/ingest.py) applies.  Even num8
            # preferred: libjpeg-turbo's even scaled IDCTs are the SIMD
            # paths (measured ~1.6x faster than odd at these sizes).
            from .ingest import pick_num8
            num8 = pick_num8(work_scale)
            if num8 % 2 == 1 and num8 < 8:
                num8 += 1
            work_scale = num8 / 8.0
        seam_scale = min(1.0, float(np.sqrt(cfg.seam_megapix * 1e6 /
                                            area0)))
        seam_work_aspect = seam_scale / work_scale
        want_feats = cfg.find_features and cfg.serialize_data

        compose_scale = 1.0
        if cfg.compose_megapix > 0:
            compose_scale = min(1.0, float(
                np.sqrt(cfg.compose_megapix * 1e6 / area0)))
        # The reference skips the compose resize when scale is within 10%
        # of 1 (:1143) — then compositing consumes FULL-res pixels.
        compose_src_scale = (compose_scale
                             if abs(compose_scale - 1) > 1e-1 else 1.0)

        if cfg.fast_ingest and not cfg.timelapse:
            from .ingest import start_fast_ingest
            fast = start_fast_ingest(
                paths, is_portrait, want_gray=want_feats,
                gray_scale=work_scale,
                rgb_scale=max(seam_scale, compose_src_scale))
        if fast is not None:
            gray_stack_raw, rgb_stack_raw = fast.upload()
            full_imgs = None
        else:
            # Legacy loop: decode full RGB one image at a time and start
            # its (async) device upload immediately — host decode of image
            # i+1 overlaps the tunnel transfer of image i.
            full_imgs = []
            device_imgs = []
            for p in paths:
                im = image_io.orient_capture(image_io.imread(p),
                                             is_portrait)
                full_imgs.append(im)
                device_imgs.append(jax.device_put(im))
            full_sizes = [(im.shape[1], im.shape[0]) for im in full_imgs]

    n = len(paths)
    uniform = len(set(full_sizes)) == 1
    seam_imgs = []          # host seam-scale pixels (non-uniform path only)
    seam_shapes = []        # (h, w) per image — all downstream ROI math
    seam_stack_dev = None  # device-resident u8 seam stack (uniform paths)
    feats: List[Features] = []
    fstack: Optional[Features] = None
    with stage_timer("Finding features", times):
        stack_u8 = None
        h0, w0 = full_sizes[0][1], full_sizes[0][0]
        if fast is not None:
            from .ingest import fast_prep
            work_hw = (scale_size(h0, w0, work_scale)
                       if work_scale != 1.0 else (h0, w0))
            seam_hw = scale_size(h0, w0, seam_scale)
            gray_work, rgb_oriented, seam_stack = fast_prep(
                fast, gray_stack_raw, rgb_stack_raw, is_portrait, work_hw,
                seam_hw)
            if want_feats:
                if cfg.features_type == "orb":
                    from ..ops.features.orb import orb_detect_stack
                    fstack = orb_detect_stack(
                        gray_work, n_features=cfg.num_features,
                        pattern=cfg.orb_pattern)
                else:
                    fstack = Features.stack([
                        detect_features(gray_work[i], cfg)
                        for i in range(n)])
            stack_u8 = rgb_oriented
            seam_stack_dev = seam_stack
            # No host download of the seam stack: the uniform warp path
            # consumes the device-resident stack, and everything after it
            # (exposure feed, seam find) reads the WARPED downloads.  Only
            # the (h, w) shapes are needed host-side for ROI bookkeeping.
            seam_shapes = [seam_hw] * n
            if want_feats and logger.isEnabledFor(20):
                counts = np.asarray(fstack.count())
                for i in range(n):
                    logger.info("Features in image #%d: %d", i + 1,
                                int(counts[i]))
        elif uniform:
            # Streamed per-image programs: each image's resize + gray +
            # detect is dispatched as soon as its (async) upload is queued,
            # so device work overlaps the next image's JPEG decode.  One
            # host sync at the end collects the seam stack.
            h0, w0 = full_imgs[0].shape[:2]
            work_hw = (scale_size(h0, w0, work_scale)
                       if work_scale != 1.0 else (h0, w0))
            seam_hw = scale_size(h0, w0, seam_scale)

            @jax.jit
            def prep(im):
                work = (resize(im, work_hw) if work_scale != 1.0
                        else im.astype(jnp.float32))
                seam = jnp.clip(jnp.round(resize(im, seam_hw)), 0, 255
                                ).astype(jnp.uint8)
                return rgb_to_gray(work), seam

            seam_list = []
            for im_dev in device_imgs:
                gray, seam = prep(im_dev)
                if want_feats:
                    feats.append(detect_features(gray, cfg))
                seam_list.append(seam)
            stack_u8 = jnp.stack(device_imgs)
            # Keep the seam stack device-resident (the uniform warp path
            # consumes it directly); no host download needed.
            seam_stack_dev = jnp.stack(seam_list)
            seam_shapes = [seam_hw] * n
            if want_feats and logger.isEnabledFor(20):
                for i, f in enumerate(feats):
                    logger.info("Features in image #%d: %d", i + 1,
                                int(f.count()))
        else:
            for im in full_imgs:
                imj = jnp.asarray(im)
                if work_scale != 1.0:
                    work_img = resize(imj, scale_size(
                        im.shape[0], im.shape[1], work_scale))
                else:
                    work_img = imj.astype(jnp.float32)
                if want_feats:
                    f = detect_features(rgb_to_gray(work_img), cfg)
                    feats.append(f)
                    if logger.isEnabledFor(20):
                        logger.info("Features in image #%d: %d", len(feats),
                                    int(f.count()))
                seam_imgs.append(np.asarray(resize(
                    imj, scale_size(im.shape[0], im.shape[1], seam_scale))))
                seam_shapes.append(seam_imgs[-1].shape[:2])

    # ---- scale priors by work_scale (:626-638) ----
    if priors is not None:
        cameras_all = priors.scaled(work_scale)
    else:
        cameras_all = None

    indices = list(range(n))
    cameras: Optional[Cameras] = None
    if cfg.find_features:
        if cfg.serialize_data:
            with stage_timer("Pairwise matching", times):
                if fstack is None:
                    fstack = Features.stack(feats)
                pm = match_all_pairs(
                    fstack, jax.random.PRNGKey(cfg.seed),
                    match_conf=cfg.match_conf, matcher_type=cfg.matcher_type,
                    range_width=cfg.range_width,
                    # Cap per-pair correspondence slots at K: only matches
                    # beyond K/pair are dropped (ratio-test counts and the
                    # confidence stay exact) and the downloaded tables stay
                    # (P, K) instead of (N, N, 2K) — BA subsamples to 256
                    # per edge anyway (pack_correspondences).
                    pair_cap=cfg.num_features)
                # ONE packed download for the matches AND the keypoint
                # coordinates (pack_correspondences in the BA stage paid a
                # separate ~30 ms sync pulling fstack.xy).
                pm, xy_host = fetch_tree((pm, fstack.xy))
                fstack = dataclasses.replace(fstack, xy=xy_host)
            if cfg.save_graph and cfg.save_graph_to:
                from ..estimation import matches_graph_dot
                with open(cfg.save_graph_to, "w") as gf:
                    gf.write(matches_graph_dot(
                        paths, pm.confidence, pm.num_inliers,
                        pm.num_matches, cfg.conf_thresh))
            indices, removed = biggest_component(pm.confidence,
                                                 cfg.conf_thresh)
            if removed:
                logger.info(
                    "Removed some images, because can't match them or there "
                    "are too similar images: (%s).",
                    ", ".join(str(i + 1) for i in removed))
                logger.info("Try to decrease the match confidence threshold "
                            "and/or check if you're stitching duplicates.")
            if len(indices) < 2:
                raise RuntimeError(
                    "Need more images: all but one were removed as "
                    "unmatchable")
        else:
            indices = persistence.deserialize_indices(cfg.checkpoint_dir)

        if cfg.serialize_data:
            # Seed cameras: sensor priors when present, else homography
            # bootstrap (the reference's dead-path estimator capability).
            pm_sub = pm.subset(indices)
            if cameras_all is not None and cfg.estimator_type != "affine":
                seed_cams = cameras_all[np.asarray(indices)]
            else:
                sizes_sub = [
                    scale_size(full_sizes[i][1], full_sizes[i][0],
                               work_scale) for i in indices]
                if cfg.estimator_type == "affine":
                    from ..estimation import affine_based_estimate
                    seed_cams = affine_based_estimate(
                        pm_sub, sizes_sub, cfg.conf_thresh)
                else:
                    seed_cams = homography_based_estimate(
                        pm_sub, sizes_sub, cfg.conf_thresh)
            with stage_timer("Bundle adjustment", times):
                # pack_correspondences reads ONLY feats.xy (host numpy
                # after the matching-stage packed fetch): tree-mapping
                # the whole Features would dispatch dead gathers of the
                # device descriptor/response stacks into the tunnel
                # stream.
                f_sub = types.SimpleNamespace(
                    xy=np.asarray(fstack.xy)[np.asarray(indices)])
                problem = pack_correspondences(f_sub, pm_sub,
                                               cfg.conf_thresh)
                cameras = bundle_adjust(seed_cams, problem,
                                        cost_func=cfg.ba_cost_func,
                                        refine_mask=cfg.ba_refine_mask)
            persistence.serialize_camera_params(cameras, cfg.checkpoint_dir)
            persistence.serialize_indices(indices, cfg.checkpoint_dir)
            if cfg.checkpoint_npz:
                np.savez(os.path.join(cfg.checkpoint_dir, "cameras.npz"),
                         focal=np.asarray(cameras.focal),
                         aspect=np.asarray(cameras.aspect),
                         ppx=np.asarray(cameras.ppx),
                         ppy=np.asarray(cameras.ppy),
                         R=np.asarray(cameras.R), t=np.asarray(cameras.t),
                         indices=np.asarray(indices))
            if cfg.infill_dropped and cameras_all is not None and \
                    len(indices) < n:
                from ..estimation import infill_dropped_cameras
                from ..core.rig import DEFAULT_RIG
                rig = (DEFAULT_RIG
                       if n == DEFAULT_RIG.total_images else None)
                cameras = infill_dropped_cameras(cameras_all, cameras,
                                                 indices, rig)
                indices = list(range(n))
        else:
            cameras = persistence.deserialize_camera_params(
                cfg.checkpoint_dir)
    else:
        cameras = (cameras_all if cameras_all is not None
                   else Cameras.identity(n, float(np.mean(
                       [s[0] for s in full_sizes]))))
        cameras = cameras[np.asarray(indices)]

    # ---- wave correction (:721-729) ----
    if cfg.do_wave_correct:
        cameras = dataclasses.replace(
            cameras, R=np.asarray(wave_correct(np.asarray(cameras.R),
                                               cfg.wave_correct)))

    paths = [paths[i] for i in indices]
    if full_imgs is not None:
        full_imgs = [full_imgs[i] for i in indices]
    full_sizes = [full_sizes[i] for i in indices]
    if seam_imgs:
        seam_imgs = [seam_imgs[i] for i in indices]
    seam_shapes = [seam_shapes[i] for i in indices]
    if stack_u8 is not None and len(indices) != stack_u8.shape[0]:
        stack_u8 = stack_u8[np.asarray(indices)]
    if (seam_stack_dev is not None
            and len(indices) != seam_stack_dev.shape[0]):
        seam_stack_dev = seam_stack_dev[np.asarray(indices)]
    n = len(paths)

    # ---- seam-scale warping (:884-995) ----
    warped_image_scale = _median_focal(np.asarray(cameras.focal))
    with stage_timer("Warping images", times):
        swa = seam_work_aspect
        warper = make_warper(cfg.warp_type, warped_image_scale * swa)
        k_all = np.asarray(cameras.K(), np.float32)
        k_seam = k_all.copy()
        k_seam[:, 0, :] *= swa
        k_seam[:, 1, :] *= swa
        r_all = np.asarray(cameras.R, np.float32)
        corners, sizes = [], []
        rois = []
        images_warped_dev = None
        masks_warped_dev = None
        for i in range(n):
            roi = warper.warp_roi(seam_shapes[i], k_seam[i],
                                  r_all[i])
            rois.append(roi)
            corners.append((roi[0], roi[1]))
            sizes.append((roi[2], roi[3]))
        if uniform:
            # One vmapped warp over padded per-image rects; 2 downloads.
            from .compose_fused import _warp_stack
            # Reuse the device-resident u8 seam stack when available —
            # re-uploading it as f32 costs ~10 MB (~0.3 s) of tunnel time.
            seam_src = (seam_stack_dev if seam_stack_dev is not None
                        else jnp.asarray(np.stack(seam_imgs), jnp.float32))
            images_warped_pad, masks_warped_pad = _warp_stack(
                seam_src,
                jnp.asarray(k_seam), jnp.asarray(r_all),
                jnp.float32(warper.scale),
                jnp.asarray(np.asarray([[r[0], r[1]] for r in rois],
                                       np.float32)),
                proj_name=warper.proj_name,
                # Snap to 64: static program dims — coarse quantisation
                # lets runs with slightly different geometry (different
                # captures, same rig) reuse compiled programs instead of
                # paying 20-300 s tunnel compiles per stitch.
                pad_h=-(-max(r[3] for r in rois) // 64) * 64,
                pad_w=-(-max(r[2] for r in rois) // 64) * 64)
            # Keep the padded stacks device-resident: exposure stats are
            # computed on device (exposure.feed_device) and the DP seam
            # finder gathers its crop content from this copy, so the
            # warped IMAGES never download on the default path — only the
            # masks do (host component labelling + partition application).
            images_warped_dev = images_warped_pad
            masks_warped_dev = masks_warped_pad
            from ..core.transfer import pack_mask_bits, unpack_mask_bits
            mw_bits = pack_mask_bits(masks_warped_pad)  # 8x fewer d2h bytes
            if cfg.seam_find_type.startswith("gc"):
                # GraphCut runs its max-flow on host pixel costs.
                iw, mwb = fetch_tree((images_warped_pad, mw_bits))
                images_warped = [
                    iw[i, :rois[i][3], :rois[i][2]].astype(np.float32)
                    for i in range(n)]
            else:
                # Defer the mask download: it rides the exposure stage's
                # packed stat fetch (one ~28 ms tunnel sync instead of
                # two — tools/vga_census.py r05).  Host consumers (seam
                # component labelling) only need the masks after that.
                mwb = None
                pending_mw_bits = mw_bits
                images_warped = None
            if mwb is not None:
                mw = unpack_mask_bits(mwb, int(masks_warped_pad.shape[2]))
                masks_warped = [mw[i, :rois[i][3], :rois[i][2]]
                                for i in range(n)]
            else:
                masks_warped = None
        else:
            images_warped, masks_warped = [], []
            for i in range(n):
                _, img_w = warper.warp(jnp.asarray(seam_imgs[i]),
                                       k_seam[i], r_all[i],
                                       dst_roi=rois[i])
                mask = np.full(seam_imgs[i].shape[:2], 255, np.uint8)
                _, mask_w = warper.warp(jnp.asarray(mask), k_seam[i],
                                        r_all[i], interp="nearest",
                                        border="constant", dst_roi=rois[i])
                images_warped.append(np.asarray(img_w))
                masks_warped.append(np.asarray(mask_w).astype(np.uint8))

    # ---- exposure compensation (:997-1025) ----
    # Cross-dateline pairs in full-360 rings sit a u-period apart after
    # the ROI rebranch; the period re-couples them for exposure/seams.
    from ..ops.warps import u_period
    seam_u_period = u_period(warper.proj_name, warper.scale)
    with stage_timer("Compensating exposure", times):
        if images_warped_dev is not None:
            extra = (pending_mw_bits if masks_warped is None else None)
            compensator = exposure_mod.feed_device(
                corners, sizes, images_warped_dev, masks_warped_dev,
                comp_type=cfg.expos_comp_type,
                nr_feeds=cfg.expos_comp_nr_feeds,
                nr_filtering=cfg.expos_comp_nr_filtering,
                block_size=cfg.expos_comp_block_size,
                period=seam_u_period, extra=extra)
            if extra is not None:
                from ..core.transfer import unpack_mask_bits
                compensator, mwb = compensator
                mw = unpack_mask_bits(
                    mwb, int(masks_warped_dev.shape[2]))
                masks_warped = [mw[i, :rois[i][3], :rois[i][2]]
                                for i in range(n)]
        else:
            compensator = exposure_mod.feed(
                corners, images_warped, masks_warped,
                comp_type=cfg.expos_comp_type,
                nr_feeds=cfg.expos_comp_nr_feeds,
                nr_filtering=cfg.expos_comp_nr_filtering,
                block_size=cfg.expos_comp_block_size,
                period=seam_u_period)

    # ---- seam finding (:1027-1067) ----
    with stage_timer("Finding seams", times):
        seam_masks = seams_mod.find_seams(
            images_warped, corners, masks_warped, cfg.seam_find_type,
            images_dev=images_warped_dev, period=seam_u_period)

    # ---- compositing (:1075-1229) ----
    timelapse_frames: List[str] = []
    with stage_timer("Compositing", times):
        # compose_scale was computed up front (reading stage) so the
        # decoder could plan DCT-scaled decodes.
        compose_work_aspect = compose_scale / work_scale
        warped_image_scale *= compose_work_aspect
        warper = make_warper(cfg.warp_type, warped_image_scale)
        cameras_c = cameras.scaled(compose_work_aspect)
        kc_all = np.asarray(cameras_c.K(), np.float32)

        comp_corners, comp_sizes = [], []
        for i in range(n):
            sw, sh = full_sizes[i]
            if abs(compose_scale - 1) > 1e-1:
                sw = int(round(sw * compose_scale))
                sh = int(round(sh * compose_scale))
            roi = warper.warp_roi((sh, sw), kc_all[i], r_all[i])
            comp_corners.append((roi[0], roi[1]))
            comp_sizes.append((roi[2], roi[3]))

        # Warped-plane coords scale with the warper scale: this ratio maps
        # compose-scale warped coords into the seam-scale frame where the
        # seam masks and exposure gain grid live.
        seam_ratio = seam_work_aspect / compose_work_aspect

        use_fused = (uniform and not cfg.timelapse and
                     cfg.blend_type in (BlenderType.MULTI_BAND,
                                        BlenderType.NO,
                                        BlenderType.FEATHER))
        if use_fused:
            from .compose_fused import fused_compose
            src_stack = (stack_u8 if stack_u8 is not None and
                         len(indices) == stack_u8.shape[0]
                         else jnp.asarray(np.stack(full_imgs)))
            if abs(compose_scale - 1) > 1e-1:
                # Target dims from the FULL-res size: src_stack may be at
                # a reduced decode scale on the fast-ingest path.
                chw = scale_size(full_sizes[0][1], full_sizes[0][0],
                                 compose_scale)
                comp_imgs = jax.vmap(lambda im: resize(im, chw))(src_stack)
            else:
                comp_imgs = src_stack
            from ..ops.warps import result_roi
            canvas_mp = (lambda c: c[2] * c[3] / 1e6)(
                result_roi(comp_corners, comp_sizes))
            if cfg.use_sharded_compose and jax.device_count() > 1:
                # Gigapixel mode: shard the compose canvas over the 'sp'
                # axis of a (1, n_devices) mesh (SURVEY.md section 5).
                from ..parallel.mesh import make_mesh
                from .compose_fused import fused_compose_sharded
                mesh = make_mesh((1, jax.device_count()), ("dp", "sp"))
                pano, pano_mask = fused_compose_sharded(
                    mesh, comp_imgs, kc_all, r_all, warper, comp_corners,
                    comp_sizes, seam_masks, corners, seam_ratio,
                    compensator, cfg.blend_type, cfg.blend_strength)
            elif (cfg.compose_strips_mp > 0
                  and canvas_mp >= cfg.compose_strips_mp):
                # Gigapixel canvas on a single chip: stream vertical
                # canvas strips so HBM holds one strip's pyramids, never
                # the whole canvas (the reference's blender grows an
                # unbounded global canvas, image_stitching.cpp:1173-1229).
                from .compose_fused import fused_compose_strips
                pano, pano_mask = fused_compose_strips(
                    comp_imgs, kc_all, r_all, warper, comp_corners,
                    comp_sizes, seam_masks, corners, seam_ratio,
                    compensator, cfg.blend_type, cfg.blend_strength,
                    strip_w=cfg.compose_strip_w)
            else:
                pano, pano_mask = fused_compose(
                    comp_imgs, kc_all, r_all, warper, comp_corners,
                    comp_sizes, seam_masks, corners, seam_ratio,
                    compensator, cfg.blend_type, cfg.blend_strength)
        else:
            blender = None
            timelapser = None
            for i in range(n):
                logger.info("Compositing image #%d", i + 1)
                img = (jnp.asarray(full_imgs[i]) if full_imgs is not None
                       else stack_u8[i])
                if abs(compose_scale - 1) > 1e-1:
                    img = resize(img, scale_size(
                        full_sizes[i][1], full_sizes[i][0], compose_scale))
                corner, img_w = warper.warp(
                    img, kc_all[i], r_all[i],
                    dst_roi=(comp_corners[i][0], comp_corners[i][1],
                             comp_sizes[i][0], comp_sizes[i][1]))
                mask = np.full((img.shape[0], img.shape[1]), 255, np.uint8)
                _, mask_w = warper.warp(
                    jnp.asarray(mask), kc_all[i], r_all[i],
                    interp="nearest", border="constant",
                    dst_roi=(comp_corners[i][0], comp_corners[i][1],
                             comp_sizes[i][0], comp_sizes[i][1]))

                img_w = exposure_mod.apply_gain(compensator, i, corner,
                                                img_w,
                                                coord_scale=seam_ratio)

                # dilate seam mask, resize to warped size, AND
                # (:1169-1171).
                seam_m = dilate3(jnp.asarray(seam_masks[i]))
                seam_m = resize(seam_m.astype(jnp.float32),
                                (int(mask_w.shape[0]),
                                 int(mask_w.shape[1])))
                final_mask = (np.asarray(seam_m) > 127) & \
                    (np.asarray(mask_w) > 0)

                if cfg.timelapse:
                    if timelapser is None:
                        timelapser = Timelapser(comp_corners, comp_sizes,
                                                cfg.timelapse_type)
                    frame = timelapser.process(img_w, None, corner)
                    out_name = fixed_name(paths[i])
                    image_io.imwrite(out_name, np.asarray(frame))
                    timelapse_frames.append(out_name)
                else:
                    if blender is None:
                        blender = make_blender(comp_corners, comp_sizes,
                                               cfg.blend_type,
                                               cfg.blend_strength)
                    blender.feed(img_w, jnp.asarray(final_mask), corner)

            if cfg.timelapse:
                pano = np.zeros((1, 1, 3), np.float32)
                pano_mask = np.zeros((1, 1), bool)
            else:
                pano_j, mask_j = blender.blend()
                pano = np.clip(np.asarray(pano_j), 0, 255)
                pano_mask = np.asarray(mask_j)

    if cfg.crop_result and not cfg.timelapse:
        pano = crop_fn(pano)

    result = StitchResult(
        panorama=pano, mask=pano_mask, kept_indices=list(indices),
        cameras=cameras, stage_times=times,
        timelapse_frames=timelapse_frames, work_scale=work_scale)

    if not cfg.timelapse:
        out = output if output is not None else cfg.result_name
        if out:
            image_io.imwrite(out, pano)
    if profiler_on:
        jax.profiler.stop_trace()
    return result
