"""Fused compositing: the whole per-image compose loop as ONE device program.

The reference's hottest loop (`image_stitching.cpp:1086-1225`) re-warps every
image at compose scale, applies gains, merges seam+warp masks, and feeds a
multi-band blender — one image at a time on the host.  Here the entire loop
is a single jitted `lax.scan` over the image axis:

  per image (on device):  backward warp (bilinear/reflect) + nearest mask
  -> block-gain sampling (seam-canvas coordinate frame) -> seam-mask
  sampling via warped-plane scale ratio (warped coords are proportional to
  the warper scale, so the seam-scale mask is sampled directly — replaces
  the dilate+resize+AND at `:1169-1171`) -> Laplacian pyramid accumulate
  into canvas band accumulators at band-aligned offsets
  final: per-band normalize + collapse -> panorama.

Host work is reduced to ROI bookkeeping (numpy ints) and ONE download of
the finished panorama — critical on axon where every device->host sync
costs ~25ms.

All per-image rects are padded to one static shape and band-aligned
against the canvas grid, so the scan body compiles once regardless of N.
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BlenderType, ExposureCompensatorType as ECType
from ..ops.blend import WEIGHT_EPS, num_bands_for
from ..ops.imgproc import dilate3
from ..ops.pyr_mat import pyr_down_mm, pyr_up_mm
from ..ops.warps import (PROJECTIONS, Warper, _backward_xy,
                         backward_xy_1d, result_roi)

__all__ = ["fused_compose", "fused_compose_sharded",
           "fused_compose_strips"]


def _patch_bilinear(img, sx, sy):
    """Bilinear sample via ONE (2,2[,C]) slice-gather per point.

    4x fewer gather descriptors than four scalar gathers (measured 31%
    faster on the tunnel v5e, tools/profile_gather.py).  Border handling
    reproduces cv2 BORDER_REFLECT exactly for the coordinates bilinear
    can produce on in-range samples: for x0 == -1 the two reflect taps
    are both column 0, which equals clamping the patch base to 0 and
    saturating the fractional weight; likewise at the high edge.  Far
    out-of-range samples clamp to the edge pixel — those are always
    masked out of the blend (weight 0), so only the pyramid's smear of
    out-of-mask content differs, and cleanly so."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    fx = jnp.where(x0i < 0, 0.0, jnp.where(x0i > w - 2, 1.0, fx))
    fy = jnp.where(y0i < 0, 0.0, jnp.where(y0i > h - 2, 1.0, fy))
    bx = jnp.clip(x0i, 0, w - 2).reshape(-1)
    by = jnp.clip(y0i, 0, h - 2).reshape(-1)
    idx = jnp.stack([by, bx], axis=-1)
    chan = img.ndim == 3
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3) if chan else (1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0, 1))
    sizes = (2, 2, img.shape[2]) if chan else (2, 2)
    patch = jax.lax.gather(img, idx, dn, slice_sizes=sizes,
                           mode=jax.lax.GatherScatterMode.CLIP)
    patch = patch.reshape(sy.shape + patch.shape[1:])
    if chan:
        fx = fx[..., None]
        fy = fy[..., None]
    top = patch[..., 0, 0, :] if chan else patch[..., 0, 0]
    tr = patch[..., 0, 1, :] if chan else patch[..., 0, 1]
    bl = patch[..., 1, 0, :] if chan else patch[..., 1, 0]
    br = patch[..., 1, 1, :] if chan else patch[..., 1, 1]
    row0 = top * (1 - fx) + tr * fx
    row1 = bl * (1 - fx) + br * fx
    return row0 * (1 - fy) + row1 * fy


def _patch_bilinear_scalar(img, sx, sy):
    """Same math and border semantics as `_patch_bilinear`, via four
    scalar gathers.

    At large point counts XLA materializes the slice-gather's
    (n, 2, 2, C) patch tensor with T(8,128) tiling on the tiny trailing
    dims — a 42x padding blowup that OOMs the compile at rig37/mosaic
    stack shapes (observed: f32[51M,2,2,3] "would exceed memory",
    104 GB for a 2.4 GB tensor).  The scalar form keeps every
    intermediate (n,) / (n, C)-shaped, which tiles cleanly; it is ~31%
    slower than the slice-gather at small shapes (tools/profile_gather),
    so `_warp_stack` switches on total point count."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    fx = jnp.where(x0i < 0, 0.0, jnp.where(x0i > w - 2, 1.0, fx))
    fy = jnp.where(y0i < 0, 0.0, jnp.where(y0i > h - 2, 1.0, fy))
    bx = jnp.clip(x0i, 0, w - 2)
    by = jnp.clip(y0i, 0, h - 2)
    top = img[by, bx]
    tr = img[by, bx + 1]
    bl = img[by + 1, bx]
    br = img[by + 1, bx + 1]
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    row0 = top * (1 - fx) + tr * fx
    row1 = bl * (1 - fx) + br * fx
    return row0 * (1 - fy) + row1 * fy


def _bilinear_sample(img, sx, sy, fill=0.0):
    """Gather with bilinear weights, constant fill outside."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None] if img.ndim == 3 else (sx - x0)
    fy = (sy - y0)[..., None] if img.ndim == 3 else (sy - y0)
    x0i = jnp.clip(x0.astype(jnp.int32), -1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h)

    def fetch(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        val = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        if img.ndim == 3:
            return jnp.where(inside[..., None], val, fill)
        return jnp.where(inside, val, fill)
    i00 = fetch(y0i, x0i)
    i01 = fetch(y0i, x0i + 1)
    i10 = fetch(y0i + 1, x0i)
    i11 = fetch(y0i + 1, x0i + 1)
    return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
            i10 * (1 - fx) * fy + i11 * fx * fy)


@functools.partial(jax.jit,
                   static_argnames=("proj_name", "pad_h", "pad_w"))
def _warp_stack(images, ks, rs, scale, tls, *, proj_name: str, pad_h: int,
                pad_w: int):
    """Vmapped warp of an image stack onto padded per-image rects.

    Returns (warped (N, pad_h, pad_w, C) uint8,
             valid (N, pad_h, pad_w) uint8 in {0,255}) — the seam-scale
    warp loop (`image_stitching.cpp:975-989`) as one device program with
    exactly two host downloads.  uint8 on purpose, twice over: the
    reference's seam-scale warp output IS CV_8UC3 (it warps the u8 image,
    then converts to CV_32F only for the seam finder), and u8+u8 is 4x
    fewer bytes through the ~20 MB/s tunnel than f32 (measured:
    tools/profile_tunnel.py).
    """
    n, hc, wc = images.shape[0], images.shape[1], images.shape[2]
    # Accept the device-resident u8 seam stack directly (avoids a ~10 MB
    # host->device f32 re-upload through the tunnel per stitch).
    images = images.astype(jnp.float32)
    # Slice-gather wins ~31% at bench shapes; at big total point counts
    # its (n, 2, 2, C) patch tensor gets a T(8,128)-tiled layout when XLA
    # materializes it (42x padding -> compile-time HBM OOM at rig37 /
    # mosaic100 shapes), so switch to scalar gathers there.
    total_pts = n * pad_h * pad_w
    sample = (_patch_bilinear if total_pts <= 8_000_000
              else _patch_bilinear_scalar)

    def one(args):
        img, k, r, tl = args
        us = tl[0] + jnp.arange(pad_w, dtype=jnp.float32)
        vs = tl[1] + jnp.arange(pad_h, dtype=jnp.float32)
        sx, sy, valid = backward_xy_1d(proj_name, us, vs, k, r, scale)
        warped = sample(img, sx, sy)
        xr = jnp.round(sx)
        yr = jnp.round(sy)
        wmask = valid & (xr >= 0) & (xr <= wc - 1) & (yr >= 0) & \
            (yr <= hc - 1)
        warped = jnp.where(wmask[..., None], warped, 0.0)
        warped_u8 = jnp.clip(jnp.round(warped), 0.0, 255.0
                             ).astype(jnp.uint8)
        return warped_u8, wmask.astype(jnp.uint8) * jnp.uint8(255)

    # Bound live f32 intermediates: one vmapped program when the whole
    # stack's worth fits comfortably, else lax.map in vmapped chunks
    # (outputs stay one (N, pad_h, pad_w[, C]) u8 stack either way).
    if total_pts <= 64_000_000:
        return jax.vmap(lambda i, k, r, t: one((i, k, r, t)))(
            images, ks, rs, tls)
    chunk = max(1, 64_000_000 // (pad_h * pad_w))
    return jax.lax.map(one, (images, ks, rs, tls), batch_size=chunk)


def _interp_matrix(coords, n_src: int):
    """Dense 1-D bilinear interpolation matrix M (n_src, n_out).

    M[i, j] = max(0, 1 - |coords[j] - i|): `src_2d @ M` (or `M.T @ src_2d`
    along the other axis) reproduces `_bilinear_sample(src, coords,
    fill=0)` exactly — out-of-range coords get all-zero columns, matching
    the constant-zero fill.  Turns separable (axis-aligned) resamplings
    into MXU matmuls instead of per-pixel gathers; measured 148 ms -> 0.3
    ms for the compose seam sample at bench shapes
    (tools/exp_sep_sample.py)."""
    i = jnp.arange(n_src, dtype=jnp.float32)[:, None]
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[None, :] - i))


def _warp_gain_seam(img, k, r, us, vs, scale, smask, stl, seam_ratio,
                    gain, gain_grid, gain_roi, *, proj_name, gain_mode,
                    use_pallas: bool = False):
    """Per-image compose sample on the warped-canvas grid us x vs (1-D).

    Backward warp (bilinear) + warp-validity mask + exposure gain +
    seam-mask sampling via the warped-plane scale ratio.  Shared by
    the single-device fused scan body and the canvas-sharded local body so
    both paths compose identically.  Returns (warped PLANAR (3, h, w),
    weight (h, w)).

    The gain and seam samples take SEPARABLE coordinates (functions of u
    alone / v alone on the regular canvas grid), so both are banded-matrix
    products (`_interp_matrix`) on the MXU rather than gathers.  With
    use_pallas the image sample itself also leaves the gather unit: the
    interp-matrix matmul kernel (kernels/warp_gather_pallas.py) measured
    8 ms vs 314 ms for the 4-scalar-gather at bench shapes (same-window
    A/B, tools/exp_warp_gather_pallas.py); a traced per-tile span check
    falls back to the gather via lax.cond when the warp is too steep —
    correctness never depends on the kernel geometry."""
    hc, wc = img.shape[0], img.shape[1]
    # Accept u8 source stacks (the strips path keeps the full image stack
    # u8 in HBM — 4x smaller); no-op for the f32 stacks fused_compose
    # already uploads.
    img = img.astype(jnp.float32)
    sx, sy, valid = backward_xy_1d(proj_name, us, vs, k, r, scale)

    def gather_sample(_):
        # BORDER_REFLECT bilinear image sample.  Four scalar gathers, NOT
        # _patch_bilinear: inside this lax.scan body the (2,2,3)-slice
        # gather lowers 10x slower (6.7s vs 0.58s whole-compose,
        # measured) — the slice-gather only wins under vmap batching
        # (_warp_stack).
        def reflect(c, nn):
            period = 2 * nn
            c = jnp.mod(c, period)
            return jnp.where(c >= nn, period - 1 - c, c)
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x0r = reflect(x0i, wc)
        x1r = reflect(x0i + 1, wc)
        y0r = reflect(y0i, hc)
        y1r = reflect(y0i + 1, hc)
        i00 = img[y0r, x0r]
        i01 = img[y0r, x1r]
        i10 = img[y1r, x0r]
        i11 = img[y1r, x1r]
        w4 = (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
              i10 * (1 - fx) * fy + i11 * fx * fy)
        return jnp.transpose(w4, (2, 0, 1))

    # Warp validity (INTER_NEAREST + BORDER_CONSTANT on the all-255
    # mask == source-rect containment of the rounded sample).
    xr = jnp.round(sx)
    yr = jnp.round(sy)
    wmask = valid & (xr >= 0) & (xr <= wc - 1) & (yr >= 0) & \
        (yr <= hc - 1)

    if use_pallas:
        from ..kernels.warp_gather_pallas import (anchored_coords,
                                                  warp_bilinear_pallas)
        # Anchor out-of-mask coords to their (row, block) valid mean:
        # in-mask samples keep exact clamp-to-edge semantics (equal to
        # BORDER_REFLECT there, see _patch_bilinear's proof); only
        # masked-out pyramid smear content differs from the gather path.
        sxa, sya, admissible = anchored_coords(sx, sy, wmask, wc, hc)

        def kernel_sample(_):
            return warp_bilinear_pallas(jnp.transpose(img, (2, 0, 1)),
                                        sxa, sya)
        warped = jax.lax.cond(admissible, kernel_sample, gather_sample, 0)
    else:
        warped = gather_sample(0)

    # Exposure gains.
    if gain_mode == "scalar":
        warped = warped * gain
    elif gain_mode == "channels":
        warped = warped * gain[:, None, None]
    elif gain_mode == "blocks":
        # Per-image gain map stretched over the image's compose-scale ROI
        # with cv2::resize INTER_LINEAR semantics (BlocksCompensator::
        # apply): grid coords (p_local + 0.5) * grid / roi_size - 0.5,
        # edge-clamped.  gain_grid = (gh_i, gw_i) of image i's own grid
        # inside the padded map; gain_roi = (x, y, w, h) of its ROI.
        # Coordinates are separable in (u, v) -> two matmuls; clipping
        # the coordinate vectors before building the matrices reproduces
        # the edge clamp, and zero-weight columns never touch the pad
        # region of the gain map.
        gh_i, gw_i = gain_grid[0], gain_grid[1]
        gx_ = jnp.clip((us - gain_roi[0] + 0.5) * gw_i / gain_roi[2] - 0.5,
                       0.0, gw_i - 1.0)
        gy_ = jnp.clip((vs - gain_roi[1] + 0.5) * gh_i / gain_roi[3] - 0.5,
                       0.0, gh_i - 1.0)
        mv = _interp_matrix(gy_, gain.shape[0])
        mu = _interp_matrix(gx_, gain.shape[1])
        if gain.ndim == 2:
            gval = (mv.T @ gain @ mu)[None]
        else:
            gval = jnp.einsum("yv,yxc,xu->cvu", mv, gain, mu)
        warped = warped * gval

    # Seam mask: sample the seam-scale mask at ratio-scaled warped
    # coords (warped-plane coordinates are proportional to warp scale;
    # the map is axis-aligned, so this too is a pair of matmuls).
    mx = us * seam_ratio - stl[0]
    my = vs * seam_ratio - stl[1]
    sval = (_interp_matrix(my, smask.shape[0]).T @ smask
            @ _interp_matrix(mx, smask.shape[1]))
    weight = jnp.where((sval > 0.5) & wmask, 1.0, 0.0)
    return warped, weight


def _l1_dist(invalid_seed: jnp.ndarray, rounds: int) -> jnp.ndarray:
    """Exact L1 (city-block) distance to the nearest True of
    `invalid_seed`, the device analogue of the cv2
    `distanceTransform(mask, DIST_L1)` inside
    `FeatherBlender::createWeightMap` (`image_stitching.cpp:78-80`
    feather option).  Min-plus doubling per axis: ascending power-of-two
    shifts reach any offset at exactly its L1 cost (binary
    decomposition), so `rounds` rounds cover distances up to
    2^rounds - 1 — enough when the weight clips at 1 for
    d >= 1/sharpness.  Fully vectorized VPU work; no sequential chamfer
    raster scan."""
    big = jnp.float32(3e8)
    d = jnp.where(invalid_seed, 0.0, big)
    for axis in (0, 1):
        for k in range(rounds):
            s = 1 << k
            fwd = jnp.roll(d, s, axis=axis)
            bwd = jnp.roll(d, -s, axis=axis)
            # Wrapped-around entries are masked with the big constant.
            idx = jnp.arange(d.shape[axis])
            keep_f = (idx >= s).reshape([-1, 1] if axis == 0 else [1, -1])
            keep_b = (idx < d.shape[axis] - s).reshape(
                [-1, 1] if axis == 0 else [1, -1])
            d = jnp.minimum(d, jnp.minimum(
                jnp.where(keep_f, fwd, big) + s,
                jnp.where(keep_b, bwd, big) + s))
    return d


def _init_accs(canvas_h: int, canvas_w: int, n_bands: int):
    return [jnp.zeros((4, canvas_h >> b, canvas_w >> b), jnp.float32)
            for b in range(n_bands + 1)]


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("proj_name", "pad_h", "pad_w", "n_bands", "gain_mode",
                     "use_pallas", "feather_sharpness", "feather_rounds"))
def _accumulate_impl(accs, images, idx, ks, rs, scale, tls, canvas_tl,
                     seam_masks, seam_tls, seam_ratio,
                     gains, gain_grids, gain_rois, *,
                     proj_name: str, pad_h: int, pad_w: int, n_bands: int,
                     gain_mode: str, use_pallas: bool = False,
                     feather_sharpness: float = 0.0,
                     feather_rounds: int = 0):
    """One scan over a BUCKET of images accumulating into the canvas
    pyramids (`accs`, donated).

    images / seam_masks / gains stay the full stacks; `idx` (B,) selects
    this bucket's members on device.  ks/rs/tls/seam_tls/gain_grids/
    gain_rois arrive already subset (tiny host arrays).  Buckets exist
    because (pad_h, pad_w) is a STATIC rect: one global rect sized by the
    largest image made every scan step pay the pole-image dims at rig
    geometries (~6x the median rect).  Accumulation is a sum, so bucket
    order doesn't matter.

    ONE scan over images: warp+gain+seam, band pyramid, and the
    weighted-laplacian accumulate — all fused per image.  The pyramid
    and accumulate run PLANAR (4, h, w) with the weight as channel 3,
    and pyrDown/pyrUp are banded matrix products on the MXU
    (ops/pyr_mat.py).  Download-honest timings at bench shapes (8 x
    0.45MP rects, 3040x544 canvas, 5 bands; tools/exp_compose_planar.py
    — jax.block_until_ready is NOT a barrier through the axon tunnel,
    see CLAUDE.md):
      interleaved (h, w, 3) + separable slice blurs   43.9 ms
      planar (4, h, w) + matmul pyramids (this)        3.0 ms
      batched einsum pyramids + accumulate-only scan   1.8 ms
        (not worth materializing every warped rect for the last 1.2 ms)
    """
    imgs_b = images[idx]
    smask_b = seam_masks[idx]
    gains_b = gains[idx]

    def body(accs, inp):
        img, k, r, tl, smask, stl, gain, ggrid, groi = inp
        us = tl[0] + jnp.arange(pad_w, dtype=jnp.float32)
        vs = tl[1] + jnp.arange(pad_h, dtype=jnp.float32)
        warped, weight = _warp_gain_seam(
            img, k, r, us, vs, scale, smask, stl, seam_ratio,
            gain, ggrid, groi, proj_name=proj_name,
            gain_mode=gain_mode, use_pallas=use_pallas)

        if feather_sharpness > 0.0:
            # FeatherBlender::feed weights: L1 distance to the nearest
            # invalid pixel WITHIN the image's warped ROI (cv2 computes
            # the map on the ROI-sized mask, so rect padding outside the
            # ROI box must not seed distances), scaled by sharpness and
            # clipped at 1.
            hard = weight > 0.0
            in_box = ((us >= groi[0]) & (us <= groi[0] + groi[2] - 1)
                      )[None, :] & \
                     ((vs >= groi[1]) & (vs <= groi[1] + groi[3] - 1)
                      )[:, None]
            d = _l1_dist(~hard & in_box, feather_rounds)
            weight = jnp.minimum(d * feather_sharpness, 1.0) * hard

        # Multi-band accumulate at band-aligned offsets, planar.
        x4 = jnp.concatenate([warped, weight[None]], axis=0)
        gauss = [x4]
        for b in range(n_bands):
            gauss.append(pyr_down_mm(gauss[-1]))
        off = (tl - canvas_tl).astype(jnp.int32)
        new_accs = []
        for b in range(n_bands + 1):
            g = gauss[b]
            if b < n_bands:
                up = pyr_up_mm(gauss[b + 1], (g.shape[1], g.shape[2]))
                lap = g - up
            else:
                lap = g
            # channel 3 accumulates its own GAUSSIAN (the blend weight),
            # channels 0-2 the weighted laplacian
            w = g[3:4]
            val = jnp.concatenate([lap[:3] * w, w], axis=0)
            ob = off >> b
            cur = jax.lax.dynamic_slice(
                accs[b], (0, ob[1], ob[0]), (4, g.shape[1], g.shape[2]))
            new_accs.append(jax.lax.dynamic_update_slice(
                accs[b], cur + val, (0, ob[1], ob[0])))
        return new_accs, 0

    accs, _ = jax.lax.scan(
        body, accs,
        (imgs_b, ks, rs, tls, smask_b, seam_tls, gains_b, gain_grids,
         gain_rois))
    return accs


@functools.partial(jax.jit, static_argnames=("n_bands",))
def _finalize_impl(accs, *, n_bands: int):
    """Normalize the accumulated pyramids and collapse to the panorama."""
    bands = [accs[b][:3] / (accs[b][3:4] + WEIGHT_EPS)
             for b in range(n_bands + 1)]
    out = bands[-1]
    for b in range(n_bands - 1, -1, -1):
        out = pyr_up_mm(out, bands[b].shape[1:]) + bands[b]
    # uint8 result: 4x less device->host traffic through the tunnel.
    out_u8 = jnp.clip(jnp.round(jnp.transpose(out, (1, 2, 0))),
                      0.0, 255.0).astype(jnp.uint8)
    return out_u8, accs[0][3] > WEIGHT_EPS


def _fused_compose_impl(images, ks, rs, scale, tls, canvas_tl,
                        seam_masks, seam_tls, seam_ratio,
                        gains, gain_grids, gain_rois, *,
                        proj_name: str, pad_h: int, pad_w: int,
                        canvas_h: int, canvas_w: int, n_bands: int,
                        seam_pad_h: int, seam_pad_w: int, gain_mode: str,
                        use_pallas: bool = False,
                        feather_sharpness: float = 0.0,
                        feather_rounds: int = 0):
    """Single-bucket composition (kept for tools/ probes): init + one
    accumulate over all images + finalize."""
    n = images.shape[0]
    accs = _init_accs(canvas_h, canvas_w, n_bands)
    accs = _accumulate_impl(
        accs, images, jnp.arange(n, dtype=jnp.int32), ks, rs, scale, tls,
        canvas_tl, seam_masks, seam_tls, seam_ratio, gains, gain_grids,
        gain_rois, proj_name=proj_name, pad_h=pad_h, pad_w=pad_w,
        n_bands=n_bands, gain_mode=gain_mode, use_pallas=use_pallas,
        feather_sharpness=feather_sharpness, feather_rounds=feather_rounds)
    return _finalize_impl(accs, n_bands=n_bands)


def _blend_params(canvas, blend_type: BlenderType, blend_strength: float):
    """Shared blend-mode resolution: (n_bands, feather_sharpness,
    feather_rounds) for the fused / sharded / strips compose paths.
    Multi-band keeps its band count from the canvas + strength formula
    (`image_stitching.cpp:1113-1120` via MultiBandBlender); FEATHER and NO
    collapse to the 0-band accumulator (feather adds the in-program
    L1-EDT weight map, cv2 createWeightMap semantics)."""
    n_bands, blend_width = num_bands_for(canvas, blend_strength)
    feather_sharpness = 0.0
    feather_rounds = 0
    if blend_type == BlenderType.NO or blend_width < 1.0:
        n_bands = 0
    elif blend_type == BlenderType.FEATHER:
        n_bands = 0
        feather_sharpness = 1.0 / blend_width
        feather_rounds = max(1, int(np.ceil(np.log2(blend_width + 1))))
    return n_bands, feather_sharpness, feather_rounds


def _prep_gains(compensator, n: int, comp_corners, comp_sizes):
    """Exposure-compensator state -> (gain_mode, gains, gain_grids,
    gain_rois) ready for the fused/sharded compose programs.  gain_rois
    are the compose-scale warped ROIs the per-image block maps stretch
    over (cv2 BlocksCompensator::apply resizes to the apply-time image)."""
    rois = np.asarray([[c[0], c[1], s[0], s[1]]
                       for c, s in zip(comp_corners, comp_sizes)],
                      np.float32)
    ones = np.ones((n, 2), np.float32)
    if compensator is None or compensator.comp_type == ECType.NO:
        return "none", np.ones((n,), np.float32), ones, rois
    if compensator.comp_type == ECType.GAIN:
        return ("scalar", np.asarray(compensator.gains, np.float32),
                ones, rois)
    if compensator.comp_type == ECType.CHANNELS:
        return ("channels", np.asarray(compensator.gains, np.float32),
                ones, rois)
    return ("blocks", np.asarray(compensator.gains, np.float32),
            np.asarray(compensator.grid_sizes, np.float32), rois)


def _prep_seam_masks(seam_masks, n: int):
    """Pad seam masks to one static shape and pre-dilate (the reference's
    dilate at image_stitching.cpp:1169)."""
    # Snap to 64: these are static program dims; coarse quantisation lets
    # runs with slightly different geometry reuse compiled programs
    # (compiles through the axon tunnel cost 20-300 s each).
    sh_pad = -(-max(m.shape[0] for m in seam_masks) // 64) * 64
    sw_pad = -(-max(m.shape[1] for m in seam_masks) // 64) * 64
    # Upload u8, cast on device: 4x fewer tunnel bytes than f32.
    smask = np.zeros((n, sh_pad, sw_pad), np.uint8)
    for i, m in enumerate(seam_masks):
        smask[i, :m.shape[0], :m.shape[1]] = (np.asarray(m) > 0)
    return dilate3(jnp.asarray(smask).astype(jnp.float32)), sh_pad, sw_pad


def fused_compose(images: jnp.ndarray, ks: np.ndarray, rs: np.ndarray,
                  warper: Warper, comp_corners, comp_sizes,
                  seam_masks, seam_corners, seam_ratio: float,
                  compensator, blend_type: BlenderType,
                  blend_strength: float):
    """Host wrapper: ROI bookkeeping in numpy, one device call, one
    download.  Returns (panorama float32 (H, W, 3), mask bool)."""
    n = images.shape[0]
    canvas = result_roi(comp_corners, comp_sizes)
    # FEATHER here = exact FeatherBlender semantics in-program: n_bands=0
    # turns the accumulator into sum(img*w)/sum(w), with w the clipped
    # L1-EDT weight map (cv2 createWeightMap, sharpness = 1/blend_width);
    # doubling rounds only need to cover d < blend_width (weights clip at
    # 1 beyond).
    n_bands, feather_sharpness, feather_rounds = _blend_params(
        canvas, blend_type, blend_strength)
    step = 1 << max(n_bands, 1)
    cx, cy, cw, ch = canvas
    # Static program dims: snap the padded canvas to a coarse quantum
    # (and the band step) so near-identical geometries compile once.
    # The output is sliced back to (ch, cw) after the download.  64 not
    # 256: the PADDED canvas is what downloads (slice happens on host),
    # so the quantum is also a d2h byte tax — 64 keeps it under ~10%
    # while still colliding same-rig geometries onto one program.
    quant = max(step, 64)
    canvas_w = -(-cw // quant) * quant
    canvas_h = -(-ch // quant) * quant

    gap = 3 * (1 << n_bands)
    tls = []
    brs = []
    for i in range(n):
        tlx = max(cx, comp_corners[i][0] - gap)
        tly = max(cy, comp_corners[i][1] - gap)
        brx = min(cx + canvas_w,
                  comp_corners[i][0] + comp_sizes[i][0] + gap)
        bry = min(cy + canvas_h,
                  comp_corners[i][1] + comp_sizes[i][1] + gap)
        tlx = cx + (((tlx - cx) >> n_bands) << n_bands)
        tly = cy + (((tly - cy) >> n_bands) << n_bands)
        tls.append((tlx, tly))
        brs.append((brx, bry))
    # Bucket images by padded-rect dims (half-octave, like the DP seam
    # buckets): the scan's rect is STATIC per program, and one global rect
    # sized by the largest image made every step pay the pole-image dims
    # at rig geometries (~6x the median rect area).  Dims snap to the band
    # step (pyramids need divisibility) and a 128 quantum for program
    # reuse across same-rig captures.
    from ..ops.seams import bucket_dim
    pad_step = max(step, 128)

    def _bdim(v, cap):
        v = -(-bucket_dim(v) // pad_step) * pad_step
        return min(v, cap)

    buckets = {}
    for i in range(n):
        bw_i = _bdim(brs[i][0] - tls[i][0], canvas_w)
        bh_i = _bdim(brs[i][1] - tls[i][1], canvas_h)
        buckets.setdefault((bh_i, bw_i), []).append(i)
    # Keep each rect inside the canvas (per its bucket dims).
    for (bh_i, bw_i), idxs in buckets.items():
        for i in idxs:
            tls[i] = (min(tls[i][0], cx + canvas_w - bw_i),
                      min(tls[i][1], cy + canvas_h - bh_i))

    smask_d, sh_pad, sw_pad = _prep_seam_masks(seam_masks, n)

    gain_mode, gains, gain_grids, gain_rois = _prep_gains(
        compensator, n, comp_corners, comp_sizes)

    # Pallas warp-gather kernel (kernels/warp_gather_pallas.py): TPU
    # backend only (the lax.cond still traces/lowers both branches), and
    # only when the padded planar source fits the VMEM budget alongside
    # the tile working set.  A traced per-image span check inside
    # _warp_gain_seam picks kernel vs gather at run time.
    hc_p = max(-(-images.shape[1] // 8) * 8, 24)
    wc_p = max(-(-images.shape[2] // 128) * 128, 384)
    # Per-CHANNEL budget: the kernel streams one channel plane at a
    # time (channel = outermost grid dim), so sources up to ~3 MP/ch
    # qualify (e.g. half-scale 8 MP e2e compose, the rig tiles, the
    # gigapixel bench sources).
    use_pallas = (os.environ.get("STITCH_NO_PALLAS", "0") != "1"
                  and jax.default_backend() == "tpu"
                  and hc_p * wc_p * 4 <= 12 * 2 ** 20)

    import time as _time
    prof = bool(os.environ.get("STITCH_PROF_COMPOSE"))
    t0 = _time.perf_counter()
    images_d = jnp.asarray(images, jnp.float32)
    ks_all = np.asarray(ks, np.float32)
    rs_all = np.asarray(rs, np.float32)
    tls_all = np.asarray(tls, np.float32)
    stl_all = np.asarray(seam_corners, np.float32)
    ggrid_all = np.asarray(gain_grids, np.float32)
    groi_all = np.asarray(gain_rois, np.float32)
    gains_d = jnp.asarray(gains)
    canvas_tl_d = jnp.asarray(np.asarray([cx, cy], np.float32))
    accs = _init_accs(int(canvas_h), int(canvas_w), int(n_bands))
    for (bh_i, bw_i), idxs in sorted(buckets.items()):
        sel = np.asarray(idxs)
        accs = _accumulate_impl(
            accs, images_d, jnp.asarray(sel, jnp.int32),
            jnp.asarray(ks_all[sel]), jnp.asarray(rs_all[sel]),
            jnp.float32(warper.scale), jnp.asarray(tls_all[sel]),
            canvas_tl_d, smask_d, jnp.asarray(stl_all[sel]),
            jnp.float32(seam_ratio), gains_d,
            jnp.asarray(ggrid_all[sel]), jnp.asarray(groi_all[sel]),
            proj_name=warper.proj_name, pad_h=int(bh_i), pad_w=int(bw_i),
            n_bands=int(n_bands), gain_mode=gain_mode,
            use_pallas=use_pallas,
            feather_sharpness=float(feather_sharpness),
            feather_rounds=int(feather_rounds))
    pano, mask = _finalize_impl(accs, n_bands=int(n_bands))
    if prof:
        print(f"# compose.dispatch: {_time.perf_counter() - t0:.3f}s "
              f"(buckets {sorted(buckets)}, canvas {canvas_h}x{canvas_w}, "
              f"bands {n_bands}, n {n})", file=sys.stderr)
        t0 = _time.perf_counter()
    from ..core.transfer import fetch_tree, pack_mask_bits, unpack_mask_bits
    # Mask rides as bit-packed u8 (8x fewer d2h bytes than bool).
    pano, mask_b = fetch_tree((pano, pack_mask_bits(mask[None])))
    mask = unpack_mask_bits(mask_b, int(canvas_w))[0] > 0
    if prof:
        print(f"# compose.fetch: {_time.perf_counter() - t0:.3f}s",
              file=sys.stderr)
    pano = np.asarray(pano)[:ch, :cw].astype(np.float32)
    mask = np.asarray(mask)[:ch, :cw]
    return pano, mask


# --------------------------------------------------------------------------
# Canvas-sharded fused compositing (gigapixel mode, SURVEY.md section 5).
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _sharded_compose_fn(mesh, axis: str, proj_name: str, canvas_h: int,
                        canvas_w: int, n_bands: int, gain_mode: str,
                        use_pallas: bool = False,
                        feather_sharpness: float = 0.0,
                        feather_rounds: int = 0):
    """Build the shard_map'd compose program for one mesh/canvas geometry.

    The canvas is sharded along its width over the mesh's `axis`; each
    device evaluates the SAME per-image body as `_fused_compose_impl`
    (via `_warp_gain_seam`) over its slice plus a recomputed margin of
    3 * 2^n_bands columns, so the Laplacian pyramid never sees a shard
    boundary and ICI traffic is zero (overlap-compute instead of halo
    exchange — the backward warp is pure math, any device can evaluate
    any canvas column).  Output stays sharded P(None, axis[, None]).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    w_local = canvas_w // n_dev
    # Feather mode widens the recompute margin so the per-shard L1 EDT
    # is exact for every interior pixel (any distance that matters —
    # below the weight's clip at 1 — fits 2^rounds - 1 <= margin).
    margin = max(3 * (1 << n_bands),
                 (1 << feather_rounds) if feather_sharpness > 0 else 0)
    w_ext = w_local + 2 * margin
    assert canvas_w % (n_dev * (1 << n_bands)) == 0
    assert canvas_h % (1 << n_bands) == 0

    def local_fn(images, ks, rs, scale, canvas_tl, smasks, stls,
                 seam_ratio, gains, gain_grids, gain_rois):
        sidx = jax.lax.axis_index(axis)
        x0 = canvas_tl[0] + (sidx * w_local - margin).astype(jnp.float32)
        us = x0 + jnp.arange(w_ext, dtype=jnp.float32)
        vs = canvas_tl[1] + jnp.arange(canvas_h, dtype=jnp.float32)

        def body(accs, inp):
            img, k, r, smask, stl, gain, ggrid, groi = inp
            warped, weight = _warp_gain_seam(
                img, k, r, us, vs, scale, smask, stl, seam_ratio,
                gain, ggrid, groi, proj_name=proj_name,
                gain_mode=gain_mode, use_pallas=use_pallas)
            if feather_sharpness > 0.0:
                # Same FeatherBlender weight map as _fused_compose_impl.
                hard = weight > 0.0
                in_box = ((us >= groi[0]) &
                          (us <= groi[0] + groi[2] - 1))[None, :] & \
                         ((vs >= groi[1]) &
                          (vs <= groi[1] + groi[3] - 1))[:, None]
                d = _l1_dist(~hard & in_box, feather_rounds)
                weight = jnp.minimum(d * feather_sharpness, 1.0) * hard
            # planar (4, h, w) + matmul pyramids — same formulation and
            # rationale as _fused_compose_impl
            x4 = jnp.concatenate([warped, weight[None]], axis=0)
            gauss = [x4]
            for _ in range(n_bands):
                gauss.append(pyr_down_mm(gauss[-1]))
            new_accs = []
            for b in range(n_bands + 1):
                g = gauss[b]
                if b < n_bands:
                    lap = g - pyr_up_mm(gauss[b + 1],
                                        (g.shape[1], g.shape[2]))
                else:
                    lap = g
                w = g[3:4]
                new_accs.append(
                    accs[b] + jnp.concatenate([lap[:3] * w, w], axis=0))
            return new_accs, 0

        # pcast-to-varying: the zero accumulators become axis-varying once
        # the body mixes in axis_index-dependent warped content.
        accs = [jax.lax.pcast(jnp.zeros(
            (4, canvas_h >> b, w_ext >> b), jnp.float32), axis, to="varying")
            for b in range(n_bands + 1)]
        accs, _ = jax.lax.scan(
            body, accs,
            (images, ks, rs, smasks, stls, gains, gain_grids, gain_rois))

        bands = [accs[b][:3] / (accs[b][3:4] + WEIGHT_EPS)
                 for b in range(n_bands + 1)]
        out = bands[-1]
        for b in range(n_bands - 1, -1, -1):
            out = pyr_up_mm(out, bands[b].shape[1:]) + bands[b]
        out = jnp.transpose(out[:, :, margin:margin + w_local], (1, 2, 0))
        out_u8 = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
        valid = accs[0][3, :, margin:margin + w_local] > WEIGHT_EPS
        return out_u8, valid

    # check_vma=False: the Pallas warp kernel cannot trace under the vma
    # checker (varying refs vs literal kernel indices); jax's sanctioned
    # mode for pallas-in-shard_map.  The pcast below becomes inert.
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(P(),) * 11,
                   out_specs=(P(None, axis, None), P(None, axis)),
                   check_vma=False)
    return jax.jit(fn)


def fused_compose_sharded(mesh, images: jnp.ndarray, ks: np.ndarray,
                          rs: np.ndarray, warper: Warper, comp_corners,
                          comp_sizes, seam_masks, seam_corners,
                          seam_ratio: float, compensator,
                          blend_type: BlenderType, blend_strength: float,
                          axis: str = "sp"):
    """Canvas-sharded `fused_compose`: same inputs plus a mesh.

    Shards the compose canvas width over `mesh.shape[axis]` devices
    (gigapixel mode — the panorama never materializes on one device
    until the final host gather).  Composes through the same
    `_warp_gain_seam` body as the single-device fused path, so output
    matches it up to pyramid boundary effects at the canvas edges.
    Returns (panorama float32 (H, W, 3), mask bool) like fused_compose.
    """
    n = images.shape[0]
    canvas = result_roi(comp_corners, comp_sizes)
    n_bands, feather_sharpness, feather_rounds = _blend_params(
        canvas, blend_type, blend_strength)
    n_dev = mesh.shape[axis]
    step = 1 << max(n_bands, 1)
    unit = n_dev * step
    cx, cy, cw, ch = canvas
    canvas_w = -(-cw // unit) * unit
    canvas_h = -(-ch // step) * step

    smask_d, _, _ = _prep_seam_masks(seam_masks, n)
    gain_mode, gains, gain_grids, gain_rois = _prep_gains(
        compensator, n, comp_corners, comp_sizes)

    hc_p = max(-(-images.shape[1] // 8) * 8, 24)
    wc_p = max(-(-images.shape[2] // 128) * 128, 384)
    # Per-CHANNEL budget: the kernel streams one channel plane at a
    # time (channel = outermost grid dim), so sources up to ~3 MP/ch
    # qualify (e.g. half-scale 8 MP e2e compose, the rig tiles, the
    # gigapixel bench sources).
    use_pallas = (os.environ.get("STITCH_NO_PALLAS", "0") != "1"
                  and jax.default_backend() == "tpu"
                  and hc_p * wc_p * 4 <= 12 * 2 ** 20)

    fn = _sharded_compose_fn(mesh, axis, warper.proj_name,
                             int(canvas_h), int(canvas_w), int(n_bands),
                             gain_mode, use_pallas,
                             float(feather_sharpness), int(feather_rounds))
    pano, mask = fn(
        jnp.asarray(images, jnp.float32),
        jnp.asarray(ks, jnp.float32), jnp.asarray(rs, jnp.float32),
        jnp.float32(warper.scale),
        jnp.asarray(np.asarray([cx, cy], np.float32)),
        smask_d,
        jnp.asarray(np.asarray(seam_corners, np.float32)),
        jnp.float32(seam_ratio),
        jnp.asarray(gains), jnp.asarray(gain_grids),
        jnp.asarray(gain_rois))
    from ..core.transfer import fetch_tree
    pano, mask = fetch_tree((pano, mask))   # one packed download
    pano = np.asarray(pano)[:ch, :cw].astype(np.float32)
    mask = np.asarray(mask)[:ch, :cw]
    return pano, mask


# --------------------------------------------------------------------------
# Canvas-strip streaming compositing (single chip, gigapixel canvases).
# --------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("n_bands", "margin", "strip_w"))
def _finalize_strip_impl(accs, *, n_bands: int, margin: int, strip_w: int):
    """Finalize one strip's accumulators and keep only the interior
    columns (the recompute margin is discarded); the validity mask rides
    bit-packed (8x fewer d2h bytes through the tunnel)."""
    from ..core.transfer import pack_mask_bits
    out_u8, valid = _finalize_impl(accs, n_bands=n_bands)
    return (out_u8[:, margin:margin + strip_w],
            pack_mask_bits(valid[:, margin:margin + strip_w]))


def fused_compose_strips(images, ks: np.ndarray, rs: np.ndarray,
                         warper: Warper, comp_corners, comp_sizes,
                         seam_masks, seam_corners, seam_ratio: float,
                         compensator, blend_type: BlenderType,
                         blend_strength: float, *, strip_w: int = 2048,
                         out=None, out_dtype=np.float32):
    """Streaming `fused_compose` for canvases too large for whole-canvas
    band accumulators: HBM only ever holds ONE vertical canvas strip's
    pyramids (plus the u8 source stack), so a 16 GB chip composes
    gigapixel panoramas (BASELINE config 5 at the scale the name claims;
    the reference's blender accumulates an unbounded global canvas,
    `image_stitching.cpp:1173-1229` — this is the bounded-memory TPU
    replacement).

    Strategy: the canvas splits into `strip_w`-wide vertical strips, each
    composed by the SAME `_accumulate_impl` scan the single-program path
    uses — per-image rects are clipped to the strip extent plus a
    recomputed `margin` of 3*2^n_bands columns (feather: 2^rounds), so
    the Laplacian/EDT never sees a strip boundary and interior columns
    match `fused_compose` to pyramid-boundary tolerance.  Every strip
    program is dispatched before any download starts (device compute
    overlaps the slow tunnel downloads); each strip fetches once, u8 +
    bit-packed mask.

    images: (N, hc, wc, 3) array — u8 device stacks are composed as-is
    (no f32 blow-up in HBM).  `out` (optional): preallocated (>=ch, >=cw,
    3) host array (e.g. np.memmap) the panorama is written into.
    Returns (panorama `out_dtype` (H, W, 3), mask bool) like
    fused_compose.
    """
    n = images.shape[0]
    canvas = result_roi(comp_corners, comp_sizes)
    n_bands, feather_sharpness, feather_rounds = _blend_params(
        canvas, blend_type, blend_strength)
    step = 1 << max(n_bands, 1)
    band = 1 << n_bands
    # Strip geometry: interior width multiple of the band step; margin a
    # band multiple >= the pyramid receptive gap (and the feather EDT
    # reach — same widening as the sharded path).
    strip_w = max(-(-strip_w // step) * step, step)
    margin = 3 * band
    if feather_sharpness > 0.0:
        margin = max(margin, 1 << feather_rounds)
    margin = -(-margin // band) * band
    w_ext = strip_w + 2 * margin
    cx, cy, cw, ch = canvas
    n_strips = -(-cw // strip_w)
    canvas_w = n_strips * strip_w
    quant = max(step, 64)
    canvas_h = -(-ch // quant) * quant

    # Global per-image rects: identical bookkeeping to fused_compose.
    gap = 3 * band
    tls, brs = [], []
    for i in range(n):
        tlx = max(cx, comp_corners[i][0] - gap)
        tly = max(cy, comp_corners[i][1] - gap)
        brx = min(cx + canvas_w,
                  comp_corners[i][0] + comp_sizes[i][0] + gap)
        bry = min(cy + canvas_h,
                  comp_corners[i][1] + comp_sizes[i][1] + gap)
        tlx = cx + (((tlx - cx) >> n_bands) << n_bands)
        tly = cy + (((tly - cy) >> n_bands) << n_bands)
        tls.append((tlx, tly))
        brs.append((brx, bry))

    smask_d, _, _ = _prep_seam_masks(seam_masks, n)
    gain_mode, gains, gain_grids, gain_rois = _prep_gains(
        compensator, n, comp_corners, comp_sizes)

    hc_p = max(-(-images.shape[1] // 8) * 8, 24)
    wc_p = max(-(-images.shape[2] // 128) * 128, 384)
    use_pallas = (os.environ.get("STITCH_NO_PALLAS", "0") != "1"
                  and jax.default_backend() == "tpu"
                  and hc_p * wc_p * 4 <= 12 * 2 ** 20)

    from ..ops.seams import bucket_dim
    pad_step = max(step, 128)

    def _bdim(v, cap):
        v = -(-bucket_dim(v) // pad_step) * pad_step
        return min(v, cap)

    images_d = jnp.asarray(images)       # u8 stays u8 (cast per image)
    ks_all = np.asarray(ks, np.float32)
    rs_all = np.asarray(rs, np.float32)
    stl_all = np.asarray(seam_corners, np.float32)
    ggrid_all = np.asarray(gain_grids, np.float32)
    groi_all = np.asarray(gain_rois, np.float32)
    gains_d = jnp.asarray(gains)
    scale_d = jnp.float32(warper.scale)
    ratio_d = jnp.float32(seam_ratio)

    prof = bool(os.environ.get("STITCH_PROF_COMPOSE"))
    import time as _time
    t0 = _time.perf_counter()
    pending = []
    for s in range(n_strips):
        x0_ext = cx + s * strip_w - margin
        x1_ext = x0_ext + w_ext
        # Per-strip rect clip: bucket (pow2-padded counts) exactly like
        # fused_compose so the scan program compiles once per distinct
        # (rect dims, count) across ALL strips of a capture geometry.
        buckets = {}
        entries = {}
        for i in range(n):
            cl_tlx = max(tls[i][0], x0_ext)
            cl_brx = min(brs[i][0], x1_ext)
            if cl_brx - cl_tlx <= 0:
                continue
            bw_i = _bdim(cl_brx - cl_tlx, w_ext)
            bh_i = _bdim(brs[i][1] - tls[i][1], canvas_h)
            tlx2 = min(cl_tlx, x1_ext - bw_i)
            tly2 = min(tls[i][1], cy + canvas_h - bh_i)
            buckets.setdefault((bh_i, bw_i), []).append(i)
            entries[i] = (tlx2, tly2)
        accs = _init_accs(int(canvas_h), int(w_ext), int(n_bands))
        canvas_tl_d = jnp.asarray(
            np.asarray([x0_ext, cy], np.float32))
        for (bh_i, bw_i), idxs in sorted(buckets.items()):
            cnt = len(idxs)
            pad_cnt = 1 << (cnt - 1).bit_length() if cnt > 1 else 1
            sel = np.asarray(idxs + [idxs[0]] * (pad_cnt - cnt))
            tls_b = np.asarray([entries[i] for i in sel], np.float32)
            stl_b = stl_all[sel].copy()
            # Dummy slots re-use image idxs[0] but point their seam-mask
            # corner far away: the separable seam sample then returns 0
            # everywhere -> blend weight exactly 0 -> zero contribution
            # (feather too: hard=0 kills the EDT weight).
            if pad_cnt > cnt:
                stl_b[cnt:] = 1e9
            accs = _accumulate_impl(
                accs, images_d, jnp.asarray(sel, jnp.int32),
                jnp.asarray(ks_all[sel]), jnp.asarray(rs_all[sel]),
                scale_d, jnp.asarray(tls_b), canvas_tl_d, smask_d,
                jnp.asarray(stl_b), ratio_d, gains_d,
                jnp.asarray(ggrid_all[sel]), jnp.asarray(groi_all[sel]),
                proj_name=warper.proj_name, pad_h=int(bh_i),
                pad_w=int(bw_i), n_bands=int(n_bands),
                gain_mode=gain_mode, use_pallas=use_pallas,
                feather_sharpness=float(feather_sharpness),
                feather_rounds=int(feather_rounds))
        pending.append(_finalize_strip_impl(
            accs, n_bands=int(n_bands), margin=int(margin),
            strip_w=int(strip_w)))
    if prof:
        print(f"# strips.dispatch: {_time.perf_counter() - t0:.3f}s "
              f"({n_strips} strips x {strip_w}, canvas {canvas_h}x"
              f"{canvas_w}, bands {n_bands}, n {n})", file=sys.stderr)
        t0 = _time.perf_counter()
    if os.environ.get("STITCH_STRIPS_FENCE", "0") == "1":
        # Diagnostic: split device compute from the tunnel download (the
        # two do NOT overlap through axon — measured r05).
        from ..core.logging import device_fence
        device_fence()
        print(f"# strips.compute(fenced): {_time.perf_counter() - t0:.3f}s",
              file=sys.stderr)
        t0 = _time.perf_counter()

    from ..core.transfer import fetch_tree, unpack_mask_bits
    if out is None:
        out = np.empty((ch, cw, 3), out_dtype)
    mask = np.empty((ch, cw), bool)
    for s, dev in enumerate(pending):
        strip_u8, bits = fetch_tree(dev)
        x0 = s * strip_w
        wv = min(strip_w, cw - x0)     # last strip may exceed cw
        out[:ch, x0:x0 + wv] = strip_u8[:ch, :wv]
        mask[:, x0:x0 + wv] = \
            unpack_mask_bits(bits, int(strip_w))[:ch, :wv] > 0
    if prof:
        print(f"# strips.fetch: {_time.perf_counter() - t0:.3f}s",
              file=sys.stderr)
    return out, mask
