"""Per-program TPU timing for the e2e pipeline's device stages.

The e2e bench's stage walls mix device time with tunnel sync latency and
host work; this isolates each jitted program with fresh-content inputs
(axon memoizes same-input executions — CLAUDE.md) at the exact shapes the
default-config 8 x 8MP bench runs them.

Run:  timeout 1800 python tools/profile_stages.py
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N, H, W = 8, 2448, 3264          # 8 MP
SEAM_SCALE = 0.112
COMPOSE_SCALE = 0.2236


def timed(fn, make_args, reps=3, label=""):
    args = make_args(0)
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf).ravel()[:4]
    ts = []
    for r in range(1, reps + 1):
        args = make_args(r)
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[:4]  # force a real download sync
        ts.append(time.perf_counter() - t0)
    print(f"{label:<28} median {np.median(ts) * 1e3:8.1f} ms   "
          f"(reps {['%.0f' % (t * 1e3) for t in ts]})")
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    gray_host = rng.integers(0, 256, (N, H, W)).astype(np.uint8)
    gray = jax.device_put(gray_host)
    jax.block_until_ready(gray)

    # ---- batched ORB detection (Finding features) -------------------------
    # u8 input stack — the production ingest dtype.
    from image_stitching_tpu.ops.features.orb import orb_detect_stack
    f = timed(lambda g: orb_detect_stack(g, n_features=1500),
              lambda r: ((gray + np.uint8(r)),),
              label="orb_detect_stack 8x8MP u8")

    # ---- matching (Pairwise matching) --------------------------------------
    from image_stitching_tpu.ops.matching import match_all_pairs
    feats = orb_detect_stack(gray, n_features=1500)
    feats = jax.tree.map(lambda x: jax.block_until_ready(x), feats)

    def mk_feats(r):
        # perturb descriptors' source: shift keypoint responses (cheap) —
        # perturb xy so RANSAC/matching content changes
        import dataclasses
        return (jax.tree.map(lambda x: x, feats),)
    key = jax.random.PRNGKey(0)

    def run_match(fs):
        return match_all_pairs(fs, key, match_conf=0.3,
                               matcher_type="homography")
    # fresh content: rebuild feats from perturbed gray each rep
    def mk(r):
        fs = orb_detect_stack(gray + np.uint8(r * 11 + 1), n_features=1500)
        fs = jax.tree.map(jax.block_until_ready, fs)
        return (fs,)
    timed(run_match, mk, label="match_all_pairs 8 imgs")

    # ---- seam-scale warp (Warping images) ----------------------------------
    from image_stitching_tpu.ops.warps import make_warper
    from image_stitching_tpu.pipeline.compose_fused import (
        _fused_compose_impl, _warp_stack)
    sh, sw = int(H * SEAM_SCALE), int(W * SEAM_SCALE)
    seam_imgs = rng.uniform(0, 255, (N, sh, sw, 3)).astype(np.float32)
    focal = (sw / 2.0) / math.tan(math.radians(55) / 2.0)
    k = np.array([[focal, 0, sw / 2], [0, focal, sh / 2], [0, 0, 1]],
                 np.float32)
    ks = np.repeat(k[None], N, 0)
    step = math.radians(55) * 0.5
    rs = []
    for i in range(N):
        yaw = (i - (N - 1) / 2) * step
        c, s = math.cos(yaw), math.sin(yaw)
        rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32))
    rs = np.stack(rs)
    warper = make_warper("spherical", focal)
    rois = [warper.warp_roi((sh, sw), ks[i], rs[i]) for i in range(N)]
    tls = jnp.asarray([[r[0], r[1]] for r in rois], jnp.float32)
    pad_h = max(r[3] for r in rois)
    pad_w = max(r[2] for r in rois)
    simgs = jax.device_put(seam_imgs)
    jax.block_until_ready(simgs)
    timed(lambda imgs: _warp_stack(imgs, jnp.asarray(ks), jnp.asarray(rs),
                                   jnp.float32(warper.scale), tls,
                                   proj_name="spherical", pad_h=pad_h,
                                   pad_w=pad_w),
          lambda r: (simgs + np.float32(r),),
          label=f"seam warp stack {sw}x{sh}")

    # ---- compose-scale fused compositing -----------------------------------
    ch_, cw_ = int(H * COMPOSE_SCALE), int(W * COMPOSE_SCALE)
    comp_imgs = rng.uniform(0, 255, (N, ch_, cw_, 3)).astype(np.float32)
    focal_c = (cw_ / 2.0) / math.tan(math.radians(55) / 2.0)
    kc = np.array([[focal_c, 0, cw_ / 2], [0, focal_c, ch_ / 2], [0, 0, 1]],
                  np.float32)
    kcs = np.repeat(kc[None], N, 0)
    warper_c = make_warper("spherical", focal_c)
    rois_c = [warper_c.warp_roi((ch_, cw_), kcs[i], rs[i]) for i in range(N)]
    cx = min(r[0] for r in rois_c)
    cy = min(r[1] for r in rois_c)
    cw = max(r[0] + r[2] for r in rois_c) - cx
    chh = max(r[1] + r[3] for r in rois_c) - cy
    n_bands = 5
    stp = 1 << n_bands
    cwb = -(-cw // stp) * stp
    chb = -(-chh // stp) * stp
    padw = min(-(-max(r[2] for r in rois_c) // stp) * stp, cwb)
    padh = min(-(-max(r[3] for r in rois_c) // stp) * stp, chb)
    tls_c = []
    for r in rois_c:
        tlx = cx + (((max(cx, r[0] - 96) - cx) >> n_bands) << n_bands)
        tly = cy + (((max(cy, r[1] - 96) - cy) >> n_bands) << n_bands)
        tls_c.append([min(tlx, cx + cwb - padw), min(tly, cy + chb - padh)])
    seam_hw = (max(2, padh), max(2, padw))
    smasks = jnp.ones((N,) + seam_hw, jnp.float32)
    stls = jnp.asarray([[r[0], r[1]] for r in rois_c], jnp.float32)
    cimgs = jax.device_put(comp_imgs)
    jax.block_until_ready(cimgs)
    timed(lambda imgs: _fused_compose_impl(
        imgs, jnp.asarray(kcs), jnp.asarray(rs),
        jnp.float32(warper_c.scale), jnp.asarray(tls_c, jnp.float32),
        jnp.asarray([cx, cy], jnp.float32), smasks, stls,
        jnp.float32(1.0), jnp.ones((N,), jnp.float32),
        jnp.ones((N, 2), jnp.float32),
        jnp.asarray([[r[0], r[1], r[2], r[3]] for r in rois_c],
                    jnp.float32),
        proj_name="spherical", pad_h=padh, pad_w=padw, canvas_h=chb,
        canvas_w=cwb, n_bands=n_bands, seam_pad_h=seam_hw[0],
        seam_pad_w=seam_hw[1], gain_mode="none"),
        lambda r: (cimgs + np.float32(r),),
        label=f"fused compose {cwb}x{chb} b5")

    print("# done")


if __name__ == "__main__":
    main()
