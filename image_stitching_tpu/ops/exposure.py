"""Exposure compensation: NO / GAIN / GAIN_BLOCKS / CHANNELS / CHANNELS_BLOCKS.

Replaces cv::detail::ExposureCompensator configured at
`/root/reference/image_stitching/image_stitching.cpp:73-76, :1002-1023`
(GAIN_BLOCKS default, nr_feeds=1, nr_filtering=2, block=64) and applied per
image at `:1162`.

Exact cv2 semantics (decoded numerically against cv2.detail and verified in
tests/test_ops.py):

  * GAIN / CHANNELS: the pairwise least-squares gain system
      sum_ij N_ij [ alpha (g_i I_ij - g_j I_ji)^2 + beta (1 - g_i)^2 ]
    with OpenCV's alpha=0.01, beta=100; the self-overlap N(i,i) (the
    image's own pixel count) enters the beta prior terms only, the alpha
    exposure-difference terms carry a factor 2, intensity is the L2 norm
    of the RGB triple (GainCompensator uses norm(Vec3b)); CHANNELS solves
    the same system per channel.
  * *_BLOCKS (cv::detail::BlocksCompensator): each image is tiled into a
    PER-IMAGE block grid — ceil(size/block) blocks of ceil(size/blocks)
    pixels, last block clipped — and every block is fed as a separate
    "image" into the same gain system (one global B_total x B_total
    solve).  Blocks of the same image never overlap, so they couple only
    through blocks of other images, exactly like OpenCV.  Block pairs
    whose RECTS intersect but whose masks do not still contribute
    N = max(1, 0) = 1 with I = 0 (OpenCV's countNonZero floor).
    The per-image gain maps are then smoothed `nr_filtering` times with
    the separable [1 2 1]/4 kernel under BORDER_REFLECT_101 (sepFilter2D's
    default border), and at apply time the map is bilinearly stretched
    over the image (cv2::resize INTER_LINEAR semantics) and multiplied in.

The gain SOLVE runs in float64 on the host like OpenCV's (double +
DECOMP_SVD): the system is at most a few thousand unknowns.  The N/I
overlap STATISTICS have two producers with identical semantics: `feed`
reduces host images (oracle tests, non-uniform pipeline path), while
`feed_device` segment-sums the pipeline's device-resident padded warped
stacks and downloads only the few-KB tables — on the default path the
warped images never reach the host at all (ops/seams.py gathers its DP
crops from the same stacks).  The APPLY side — a multiply over every
compose-scale pixel — stays on device (the fused compose path samples
the gain maps in `pipeline/compose_fused.py`).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExposureCompensatorType as ECType
from .imgproc import resize
from .seams import periodic_corner

__all__ = ["ExposureCompensator", "feed", "feed_device", "apply_gain"]

_ALPHA = 0.01
_BETA = 100.0


@dataclasses.dataclass
class ExposureCompensator:
    """Fitted gains.

    Global types: `gains` is (N,) (GAIN) or (N, 3) (CHANNELS).
    Block types: `gains` is (N, Gy_max, Gx_max) or (..., 3), zero-padded to
    the largest grid; `grid_sizes[i] = (gy_i, gx_i)` is image i's actual
    per-image block-grid shape (cv2 grids differ per image size)."""
    comp_type: ECType
    gains: np.ndarray
    grid_sizes: np.ndarray  # (N, 2) int; (1, 1) rows for global types


def _block_grid(w: int, h: int, block: int) -> Tuple[int, int, int, int]:
    """cv::detail::BlocksCompensator::feed block layout for one image:
    (grid_w, grid_h, block_w, block_h) with OpenCV's ceil-twice rounding."""
    gw = (w + block - 1) // block
    gh = (h + block - 1) // block
    bw = (w + gw - 1) // gw
    bh = (h + gh - 1) // gh
    return gw, gh, bw, bh


def _overlap_rect(c1, s1, c2, s2):
    x = max(c1[0], c2[0])
    y = max(c1[1], c2[1])
    x2 = min(c1[0] + s1[0], c2[0] + s2[0])
    y2 = min(c1[1] + s1[1], c2[1] + s2[1])
    return x, y, x2 - x, y2 - y


def _block_rects(grids, sizes, corner, i):
    """Global-coord rects of image i's blocks (shared by feed paths).
    `corner` is the image's EFFECTIVE corner for the current pair — the
    period-shifted alias for cross-dateline pairs (seams.periodic_corner)."""
    gw, gh, bw, bh = grids[i]
    w, h = sizes[i]
    bx = np.arange(gw) * bw
    by = np.arange(gh) * bh
    x0 = (corner[0] + bx)[None, :].repeat(gh, 0).ravel()
    y0 = (corner[1] + by)[:, None].repeat(gw, 1).ravel()
    x1 = np.minimum(x0 + bw, corner[0] + w)
    y1 = np.minimum(y0 + bh, corner[1] + h)
    return x0, y0, x1, y1


def _assemble_pair(n_mat, i_mat, grids, sizes, ci, cj, offs, i, j, cnt,
                   si, sj):
    """Write one pair's (cnt, per-side intensity-sum) stats into the
    global system with OpenCV's max(1, countNonZero) rect floor —
    identical for the host and device stat producers."""
    gwi, ghi, _, _ = grids[i]
    gwj, ghj, _, _ = grids[j]
    bi, bj = gwi * ghi, gwj * ghj
    xi0, yi0, xi1, yi1 = _block_rects(grids, sizes, ci, i)
    xj0, yj0, xj1, yj1 = _block_rects(grids, sizes, cj, j)
    rect_int = ((np.minimum(xi1[:, None], xj1[None, :]) >
                 np.maximum(xi0[:, None], xj0[None, :])) &
                (np.minimum(yi1[:, None], yj1[None, :]) >
                 np.maximum(yi0[:, None], yj0[None, :])))
    npair = np.where(rect_int, np.maximum(cnt, 1.0), 0.0)
    sl_i = slice(offs[i], offs[i] + bi)
    sl_j = slice(offs[j], offs[j] + bj)
    n_mat[sl_i, sl_j] = npair
    n_mat[sl_j, sl_i] = npair.T
    denom = np.maximum(npair, 1.0)[..., None]
    i_mat[sl_i, sl_j, :] = si / denom
    i_mat[sl_j, sl_i, :] = (sj / denom).transpose(1, 0, 2)


def _solve_gain_system(n_mat: np.ndarray, i_mat: np.ndarray) -> np.ndarray:
    """One channel of the OpenCV gain system over B block-images.

    n_mat: (B, B) overlap pixel counts (self-counts on the diagonal);
    i_mat: (B, B) mean intensity of block a over overlap(a, b).
    A/b assembled exactly like GainCompensator::singleFeed: self-counts in
    the beta prior terms only, factor-2 alpha terms, float64 solve."""
    b_tot = n_mat.shape[0]
    eye = np.eye(b_tot, dtype=bool)
    n_off = np.where(eye, 0.0, n_mat)
    a = -2.0 * _ALPHA * i_mat * i_mat.T * n_off
    diag = (_BETA * n_mat.sum(axis=1) +
            2.0 * _ALPHA * (i_mat * i_mat * n_off).sum(axis=1))
    a[eye] = diag
    b = _BETA * n_mat.sum(axis=1)
    # Isolated blocks (no pixels anywhere) still carry N(a,a) = 1 from the
    # countNonZero floor, so the system is never singular; lstsq mirrors
    # OpenCV's DECOMP_SVD robustness anyway.
    if b_tot <= 512:
        return np.linalg.lstsq(a, b, rcond=None)[0]
    # Large-B path (BLOCKS modes at many images): the system couples a
    # block only to spatially-overlapping blocks of OTHER images, so A is
    # >99% zeros at rig scale — a sparse LU solves in <1s where the dense
    # SVD took 302s of the 327s rig37 wall (37 imgs, ~4000 blocks,
    # measured 2026-08-18).  Same solution to fp precision; the small-B
    # branch keeps the SVD path that the cv2-exact oracle tests pin.
    try:
        import scipy.sparse as _sp
        from scipy.sparse.linalg import spsolve as _spsolve
        x = _spsolve(_sp.csc_matrix(a), b)
        # A near-singular system makes spsolve WARN and return inf/NaN
        # without raising — validate instead of trusting the except path.
        if np.all(np.isfinite(x)):
            return x
    except Exception:  # pragma: no cover - robustness fallback
        pass
    return np.linalg.lstsq(a, b, rcond=None)[0]


def _filter_gain_map(gmap: np.ndarray, iters: int) -> np.ndarray:
    """sepFilter2D with kernel [0.25 0.5 0.25] (both axes), repeated
    `iters` times, BORDER_REFLECT_101 — cv2 borderInterpolate returns
    index 0 for length-1 axes, which makes them invariant."""
    for _ in range(iters):
        for ax in (0, 1):
            if gmap.shape[ax] == 1:
                continue
            pad = [(0, 0)] * gmap.ndim
            pad[ax] = (1, 1)
            p = np.pad(gmap, pad, mode="reflect")
            sl = [slice(None)] * gmap.ndim

            def at(k):
                s = list(sl)
                s[ax] = slice(k, k + gmap.shape[ax])
                return p[tuple(s)]
            gmap = 0.25 * at(0) + 0.5 * at(1) + 0.25 * at(2)
    return gmap


def feed(corners, images_warped, masks_warped,
         comp_type: ECType = ECType.GAIN_BLOCKS, nr_feeds: int = 1,
         nr_filtering: int = 2, block_size: int = 64,
         period=None) -> ExposureCompensator:
    """Fit the compensator (compensator->feed at `:1023`).

    period: warped u-axis period (2*pi*scale) for periodic projections —
    couples cross-dateline pairs via seams.periodic_corner."""
    if isinstance(comp_type, str):
        comp_type = ECType(comp_type.lower())
    n = len(images_warped)
    if comp_type == ECType.NO:
        return ExposureCompensator(comp_type, np.ones(n),
                                   np.ones((n, 2), np.int32))

    blocks = comp_type in (ECType.GAIN_BLOCKS, ECType.CHANNELS_BLOCKS)
    per_channel = comp_type in (ECType.CHANNELS, ECType.CHANNELS_BLOCKS)
    nch = 3 if per_channel else 1

    imgs = [np.asarray(im, np.float64) for im in images_warped]
    msks = [np.asarray(m) > 0 for m in masks_warped]
    sizes = [(im.shape[1], im.shape[0]) for im in imgs]
    intens = [im if per_channel else
              np.linalg.norm(im, axis=-1)[..., None] for im in imgs]

    # Block decomposition: one block per image for the global types makes
    # GAIN/CHANNELS the trivial case of the same machinery.
    grids: List[Tuple[int, int, int, int]] = []
    offs: List[int] = []
    b_tot = 0
    for w, h in sizes:
        g = _block_grid(w, h, block_size) if blocks else (1, 1, w, h)
        grids.append(g)
        offs.append(b_tot)
        b_tot += g[0] * g[1]

    n_mat = np.zeros((b_tot, b_tot))
    i_mat = np.zeros((b_tot, b_tot, nch))

    def block_index_map(i, x0, y0, w, h):
        """Block index of image i for local pixels [x0, x0+w) x [y0, y0+h)."""
        gw, _, bw, bh = grids[i]
        bx = (x0 + np.arange(w)) // bw
        by = (y0 + np.arange(h)) // bh
        return by[:, None] * gw + bx[None, :]

    for i in range(n):
        gw, gh, _, _ = grids[i]
        bi = gw * gh
        ai = offs[i] + np.arange(bi)
        # Self stats: N(a,a) = max(1, own masked pixel count), I(a,a) =
        # own masked mean (enters the beta prior only).
        bmap = block_index_map(i, 0, 0, sizes[i][0], sizes[i][1])
        key = bmap[msks[i]]
        cnt = np.bincount(key, minlength=bi).astype(np.float64)
        n_mat[ai, ai] = np.maximum(cnt, 1.0)
        for c in range(nch):
            s = np.bincount(key, weights=intens[i][..., c][msks[i]],
                            minlength=bi)
            i_mat[ai, ai, c] = s / np.maximum(cnt, 1.0)

        for j in range(i + 1, n):
            cj = periodic_corner(corners[i], sizes[i], corners[j],
                                 sizes[j], period)
            x, y, w, h = _overlap_rect(corners[i], sizes[i], cj, sizes[j])
            if w <= 0 or h <= 0:
                continue
            gwj, ghj, _, _ = grids[j]
            bj = gwj * ghj
            oxi, oyi = x - corners[i][0], y - corners[i][1]
            oxj, oyj = x - cj[0], y - cj[1]
            both = (msks[i][oyi:oyi + h, oxi:oxi + w] &
                    msks[j][oyj:oyj + h, oxj:oxj + w])
            bmap_i = block_index_map(i, oxi, oyi, w, h)
            bmap_j = block_index_map(j, oxj, oyj, w, h)
            key = (bmap_i * bj + bmap_j)[both]
            cnt = np.bincount(key, minlength=bi * bj).astype(
                np.float64).reshape(bi, bj)
            ii = intens[i][oyi:oyi + h, oxi:oxi + w]
            ij = intens[j][oyj:oyj + h, oxj:oxj + w]
            si = np.stack([np.bincount(key, weights=ii[..., c][both],
                                       minlength=bi * bj).reshape(bi, bj)
                           for c in range(nch)], -1)
            sj = np.stack([np.bincount(key, weights=ij[..., c][both],
                                       minlength=bi * bj).reshape(bi, bj)
                           for c in range(nch)], -1)
            _assemble_pair(n_mat, i_mat, grids, sizes, corners[i], cj,
                           offs, i, j, cnt, si, sj)

    return _fit_gains(comp_type, n, grids, offs, b_tot, n_mat, i_mat,
                      nr_feeds, nr_filtering, per_channel, blocks)


def _fit_gains(comp_type, n, grids, offs, b_tot, n_mat, i_mat, nr_feeds,
               nr_filtering, per_channel, blocks) -> ExposureCompensator:
    """Shared tail of feed/feed_device: solve, filter, package."""
    nch = i_mat.shape[-1]
    # nr_feeds iterations: applying gains scales each block's observed
    # intensity, i.e. scales I's rows (GainCompensator::feed loop).
    gains = np.ones((b_tot, nch))
    for _ in range(max(1, nr_feeds)):
        i_eff = i_mat * gains[:, None, :]
        for c in range(nch):
            gains[:, c] *= _solve_gain_system(n_mat, i_eff[..., c])

    if not blocks:
        g = gains if per_channel else gains[:, 0]
        return ExposureCompensator(comp_type, np.asarray(g, np.float64),
                                   np.ones((n, 2), np.int32))

    # Per-image gain maps, filtered, padded to the largest grid.
    gy_max = max(g[1] for g in grids)
    gx_max = max(g[0] for g in grids)
    shape = (n, gy_max, gx_max, 3) if per_channel else (n, gy_max, gx_max)
    out = np.zeros(shape, np.float32)
    grid_sizes = np.zeros((n, 2), np.int32)
    for i in range(n):
        gw, gh, _, _ = grids[i]
        gm = gains[offs[i]:offs[i] + gw * gh].reshape(gh, gw, nch)
        gm = _filter_gain_map(gm, nr_filtering)
        if per_channel:
            out[i, :gh, :gw] = gm
        else:
            out[i, :gh, :gw] = gm[..., 0]
        grid_sizes[i] = (gh, gw)
    return ExposureCompensator(comp_type, out, grid_sizes)


# ------------------------------------------------- device-side statistics --
# The host feed() needs the warped seam-scale images on the host; on the
# uniform pipeline path they are already device-resident (the vmapped seam
# warp's padded stacks) and the DP seam finder no longer downloads them
# (ops/seams.py images_dev).  feed_device() computes the SAME N/I overlap
# statistics on device and downloads only few-KB tables, removing the
# warped-image download from the default pipeline entirely.
#
# TPU-first design: block binning is SEPARABLE — a pixel's block-row index
# depends only on y and its block-col index only on x, for BOTH images of
# a pair (they share the overlap rect's y/x).  So the (block_i, block_j)
# pair statistics factor through a tiny staircase of distinct
# (row-block_i, row-block_j) ranks along y (at most gh_i + gh_j - 1 of
# them) and the same along x.  Each pair's stats then become two one-hot
# MATMULS on the MXU:  Y^T @ fields @ X  with Y (rect_h, n_py) and
# X (rect_w, n_px) — no scatter/segment_sum, and the downloaded table is
# (n_py, n_px) instead of (blocks_i, blocks_j).  At the reference's
# flagship rig37 geometry this shrinks the stat download from ~460 MB
# (global-block tables at b_cap=352 over 309 pairs) to a few MB and turns
# the device work into MXU-friendly batched matmuls.  The host maps ranks
# back to global block indices (np.unique staircases, exact).
#
# Sums of u8-valued pixels are exact in f32 (integers < 2^24) with
# Precision.HIGHEST matmuls; the GAIN intensity is an L2 norm, f32-vs-f64
# differences land ~1e-6 relative (parity-tested).

_PREC = jax.lax.Precision.HIGHEST  # exact-f32 one-hot binning matmuls


def _intensity(img_f: "jnp.ndarray", nch_mode: str) -> "jnp.ndarray":
    if nch_mode == "norm":
        return jnp.linalg.norm(img_f, axis=-1)[..., None]
    return img_f


def _snap8(x: int) -> int:
    return -(-x // 8) * 8


def _rank_cap(bucket_dim_: int, block_size: int, blocks: bool) -> int:
    """Static bound (incl. one trash slot) on the number of distinct
    (block_i, block_j) rank pairs along one axis of an overlap rect of at
    most `bucket_dim_` pixels.  cv2's ceil-twice grid makes every block
    dim > block_size/2, so each side's staircase has at most
    bucket/(block/2+1) + 2 steps."""
    if not blocks:
        return 8  # one block per image: a single rank (+ trash)
    bmin = block_size // 2 + 1
    return _snap8(2 * (bucket_dim_ // bmin + 2))


def _staircase(o_i: int, o_j: int, b_i: int, b_j: int, length: int):
    """Dense ranks of the (block_i, block_j) index pairs along one axis.

    o_*: overlap-rect offset in each image's local coords; b_*: block dim.
    Returns (ranks (length,) int32, blk_i (n,), blk_j (n,)) where n is the
    number of distinct pairs; both staircases are nondecreasing, so the
    combined key is nondecreasing and np.unique order == appearance order.
    """
    t = np.arange(length, dtype=np.int64)
    ri = (o_i + t) // b_i
    rj = (o_j + t) // b_j
    key = ri << 20 | rj
    uniq, inv = np.unique(key, return_inverse=True)
    return (inv.astype(np.int32), (uniq >> 20).astype(np.int32),
            (uniq & ((1 << 20) - 1)).astype(np.int32))


@functools.partial(jax.jit, static_argnames=("gh_cap", "gw_cap",
                                             "nch_mode"))
def _self_stats_dev(stack, masks, params, *, gh_cap: int, gw_cap: int,
                    nch_mode: str):
    """Per-image own-block stats via separable one-hot matmuls.

    params: (N, 5) int32 (gw, bw, bh, w, h).  Returns one packed table
    (N, gh_cap, gw_cap, 1 + nch): [..., 0] masked pixel counts,
    [..., 1:] intensity sums, laid out on each image's own block grid."""
    n, hp, wp = masks.shape

    def one(img, msk, prm):
        bw, bh, w, h = prm[1], prm[2], prm[3], prm[4]
        ry = jnp.arange(hp) // bh
        rx = jnp.arange(wp) // bw
        ymat = ((ry[:, None] == jnp.arange(gh_cap)[None, :]) &
                (jnp.arange(hp) < h)[:, None]).astype(jnp.float32)
        xmat = ((rx[:, None] == jnp.arange(gw_cap)[None, :]) &
                (jnp.arange(wp) < w)[:, None]).astype(jnp.float32)
        m = (msk > 0).astype(jnp.float32)
        inten = _intensity(img.astype(jnp.float32), nch_mode)
        fields = jnp.concatenate([m[..., None], m[..., None] * inten], -1)
        a = jnp.tensordot(ymat, fields, axes=((0,), (0,)),
                          precision=_PREC)           # (gh_cap, wp, c)
        t = jnp.tensordot(a, xmat, axes=((1,), (0,)),
                          precision=_PREC)           # (gh_cap, c, gw_cap)
        return jnp.transpose(t, (0, 2, 1))

    return jax.vmap(one)(stack, masks, params)


@functools.partial(jax.jit, static_argnames=("nch_mode", "bh_b", "bw_b",
                                             "py_cap", "px_cap"))
def _pair_stats_dev(stack, masks, idx_i, idx_j, off_i, off_j, rect_hw,
                    py_keys, px_keys, *, nch_mode: str, bh_b: int,
                    bw_b: int, py_cap: int, px_cap: int):
    """Bucketed pair-overlap stats: crop gather + one-hot binning matmuls.

    idx_*: (T,) image indices; off_*: (T, 2) overlap-rect offsets in each
    image's local coords; rect_hw: (T, 2) real rect dims inside the
    (bh_b, bw_b) bucket; py_keys (T, bh_b) / px_keys (T, bw_b): host-built
    staircase ranks of the (block_i, block_j) pairs along each axis
    (out-of-rect entries may hold any value — they are masked).  Returns
    one packed table (T, py_cap, px_cap, 1 + 2*nch): [..., 0] overlap
    pixel counts, [..., 1:1+nch] side-i intensity sums, the rest side-j.
    """
    n, hp, wp = masks.shape
    # Pad once so every bucket rect is a contiguous dynamic_slice: a
    # vmapped dynamic_slice lowers to a BLOCK gather, where the previous
    # 2D advanced-indexing crop lowered to an element gather — measured
    # 50+ s of device time on the rig37 pole buckets (~2.5G gathered
    # elements) vs matmul work of a few hundred ms.  The pad is one HBM
    # copy (~0.5 ms/GB) shared by the whole bucket's vmap.
    stack_p = jnp.pad(stack, ((0, 0), (0, bh_b), (0, bw_b), (0, 0)))
    masks_p = jnp.pad(masks, ((0, 0), (0, bh_b), (0, bw_b)))

    def gather(img_idx, off):
        oy = jnp.clip(off[0], 0, hp)
        ox = jnp.clip(off[1], 0, wp)
        sub_img = jax.lax.dynamic_slice(
            stack_p, (img_idx, oy, ox, 0),
            (1, bh_b, bw_b, stack_p.shape[-1]))[0]
        sub_msk = jax.lax.dynamic_slice(
            masks_p, (img_idx, oy, ox), (1, bh_b, bw_b))[0]
        return sub_img, sub_msk

    def one(ii, jj, oi, oj, hw, pyk, pxk):
        img_i, msk_i = gather(ii, oi)
        img_j, msk_j = gather(jj, oj)
        rr = jax.lax.broadcasted_iota(jnp.int32, (bh_b, bw_b), 0) < hw[0]
        cc = jax.lax.broadcasted_iota(jnp.int32, (bh_b, bw_b), 1) < hw[1]
        both = (msk_i > 0) & (msk_j > 0) & rr & cc
        bf = both.astype(jnp.float32)[..., None]
        inten_i = _intensity(img_i.astype(jnp.float32), nch_mode)
        inten_j = _intensity(img_j.astype(jnp.float32), nch_mode)
        fields = jnp.concatenate(
            [bf, bf * inten_i, bf * inten_j], -1)     # (bh_b, bw_b, 1+2nch)
        ymat = (pyk[:, None] == jnp.arange(py_cap)[None, :]).astype(
            jnp.float32)                              # (bh_b, py_cap)
        xmat = (pxk[:, None] == jnp.arange(px_cap)[None, :]).astype(
            jnp.float32)                              # (bw_b, px_cap)
        a = jnp.tensordot(ymat, fields, axes=((0,), (0,)),
                          precision=_PREC)            # (py_cap, bw_b, c)
        t = jnp.tensordot(a, xmat, axes=((1,), (0,)),
                          precision=_PREC)            # (py_cap, c, px_cap)
        return jnp.transpose(t, (0, 2, 1))

    return jax.vmap(one)(idx_i, idx_j, off_i, off_j, rect_hw, py_keys,
                         px_keys)


def feed_device(corners, sizes, images_dev, masks_dev,
                comp_type: ECType = ECType.GAIN_BLOCKS, nr_feeds: int = 1,
                nr_filtering: int = 2, block_size: int = 64,
                period=None, extra=None):
    """feed() with the N/I statistics computed on device.

    images_dev/masks_dev: the pipeline's padded warped stacks (N, Hp, Wp,
    3) / (N, Hp, Wp), each image's rect origin-anchored; sizes: per-image
    (w, h).  The downloads are the few-KB stat tables (one packed
    transfer), not the images.

    extra: optional pytree of device arrays to ride the SAME packed
    download (the stitcher defers its warped-mask fetch into this — one
    ~28 ms tunnel sync instead of two, tools/vga_census.py r05).  When
    given, returns (compensator, extra_host)."""
    if isinstance(comp_type, str):
        comp_type = ECType(comp_type.lower())
    from ..core.transfer import fetch_tree
    from .seams import bucket_dim as _bucket_dim

    import sys
    import time as _time
    prof = bool(os.environ.get("STITCH_PROF_EXPOSURE"))
    t_last = _time.perf_counter()

    def _mark(label):
        nonlocal t_last
        if prof:
            now = _time.perf_counter()
            print(f"# exposure.{label}: {now - t_last:.3f}s",
                  file=sys.stderr)
            t_last = now

    n = len(sizes)
    if comp_type == ECType.NO:
        out = ExposureCompensator(comp_type, np.ones(n),
                                  np.ones((n, 2), np.int32))
        if extra is not None:
            return out, fetch_tree(extra)
        return out
    blocks = comp_type in (ECType.GAIN_BLOCKS, ECType.CHANNELS_BLOCKS)
    per_channel = comp_type in (ECType.CHANNELS, ECType.CHANNELS_BLOCKS)
    nch = 3 if per_channel else 1
    nch_mode = "channels" if per_channel else "norm"

    grids: List[Tuple[int, int, int, int]] = []
    offs: List[int] = []
    b_tot = 0
    for w, h in sizes:
        g = _block_grid(w, h, block_size) if blocks else (1, 1, w, h)
        grids.append(g)
        offs.append(b_tot)
        b_tot += g[0] * g[1]

    params = np.asarray([(g[0], g[2], g[3], s[0], s[1])
                         for g, s in zip(grids, sizes)], np.int32)
    params_d = jnp.asarray(params)

    # Static self-table caps derive from the padded stack dims (compile
    # sharing across same-rig captures whose exact ROIs differ).
    hp, wp = int(masks_dev.shape[1]), int(masks_dev.shape[2])
    if blocks:
        bmin = block_size // 2 + 1
        gh_cap = _snap8(hp // bmin + 2)
        gw_cap = _snap8(wp // bmin + 2)
    else:
        gh_cap = gw_cap = 8

    # Queue every upload/dispatch, download ALL stats in one transfer.
    self_pend = _self_stats_dev(images_dev, masks_dev, params_d,
                                gh_cap=gh_cap, gw_cap=gw_cap,
                                nch_mode=nch_mode)
    pair_meta = []
    buckets = {}
    for i in range(n):
        for j in range(i + 1, n):
            cj = periodic_corner(corners[i], sizes[i], corners[j],
                                 sizes[j], period)
            x, y, w, h = _overlap_rect(corners[i], sizes[i], cj, sizes[j])
            if w <= 0 or h <= 0:
                continue
            buckets.setdefault((_bucket_dim(h), _bucket_dim(w)),
                               []).append((i, j, y - corners[i][1],
                                           x - corners[i][0],
                                           y - cj[1],
                                           x - cj[0], h, w, cj))
    pair_pend = []
    for (bh_b, bw_b), items in buckets.items():
        t_pad = 1
        while t_pad < len(items):
            t_pad <<= 1
        py_cap = _rank_cap(bh_b, block_size, blocks)
        px_cap = _rank_cap(bw_b, block_size, blocks)
        idx_i = np.zeros((t_pad,), np.int32)
        idx_j = np.zeros((t_pad,), np.int32)
        of_i = np.zeros((t_pad, 2), np.int32)
        of_j = np.zeros((t_pad, 2), np.int32)
        hw = np.ones((t_pad, 2), np.int32)
        pyk = np.zeros((t_pad, bh_b), np.int32)
        pxk = np.zeros((t_pad, bw_b), np.int32)
        ranks = []
        for slot, (i, j, oyi, oxi, oyj, oxj, h, w, _cj) in enumerate(items):
            idx_i[slot], idx_j[slot] = i, j
            of_i[slot] = (oyi, oxi)
            of_j[slot] = (oyj, oxj)
            hw[slot] = (h, w)
            ry, ryi_u, ryj_u = _staircase(oyi, oyj, grids[i][3],
                                          grids[j][3], h)
            rx, rxi_u, rxj_u = _staircase(oxi, oxj, grids[i][2],
                                          grids[j][2], w)
            assert len(ryi_u) < py_cap and len(rxi_u) < px_cap
            pyk[slot, :h] = ry
            pxk[slot, :w] = rx
            ranks.append((ryi_u, ryj_u, rxi_u, rxj_u))
        pair_pend.append(_pair_stats_dev(
            images_dev, masks_dev, jnp.asarray(idx_i),
            jnp.asarray(idx_j), jnp.asarray(of_i), jnp.asarray(of_j),
            jnp.asarray(hw), jnp.asarray(pyk), jnp.asarray(pxk),
            nch_mode=nch_mode, bh_b=bh_b, bw_b=bw_b, py_cap=py_cap,
            px_cap=px_cap))
        pair_meta.append((items, ranks))
    _mark("dispatch")

    self_tbl, pair_stats, extra_host = fetch_tree(
        (self_pend, pair_pend, extra))
    _mark("fetch")

    # Assemble the global system exactly like the host feed (shared
    # _assemble_pair helper carries the rect-intersection N floor).
    n_mat = np.zeros((b_tot, b_tot))
    i_mat = np.zeros((b_tot, b_tot, nch))

    for i in range(n):
        gw, gh, _, _ = grids[i]
        bi = gw * gh
        ai = offs[i] + np.arange(bi)
        tbl = self_tbl[i][:gh, :gw].astype(np.float64)
        cnt = tbl[..., 0].ravel()
        n_mat[ai, ai] = np.maximum(cnt, 1.0)
        i_mat[ai, ai, :] = (tbl[..., 1:].reshape(bi, nch) /
                            np.maximum(cnt, 1.0)[:, None])

    for (items, ranks), tbl_t in zip(pair_meta, pair_stats):
        for slot, (i, j, *_rest) in enumerate(items):
            cj = _rest[-1]
            bi = grids[i][0] * grids[i][1]
            bj = grids[j][0] * grids[j][1]
            ryi_u, ryj_u, rxi_u, rxj_u = ranks[slot]
            n_py, n_px = len(ryi_u), len(rxi_u)
            tbl = tbl_t[slot][:n_py, :n_px].astype(np.float64)
            # Rank pair (p, q) identifies exactly one (block_i, block_j)
            # pair; scatter the tiny rank table onto the dense per-pair
            # block tables the shared assembler expects.
            bi_g = ryi_u[:, None] * grids[i][0] + rxi_u[None, :]
            bj_g = ryj_u[:, None] * grids[j][0] + rxj_u[None, :]
            cnt = np.zeros((bi, bj))
            si = np.zeros((bi, bj, nch))
            sj = np.zeros((bi, bj, nch))
            cnt[bi_g, bj_g] = tbl[..., 0]
            si[bi_g, bj_g, :] = tbl[..., 1:1 + nch]
            sj[bi_g, bj_g, :] = tbl[..., 1 + nch:]
            _assemble_pair(n_mat, i_mat, grids, sizes, corners[i], cj,
                           offs, i, j, cnt, si, sj)
    _mark("assemble")

    out = _fit_gains(comp_type, n, grids, offs, b_tot, n_mat, i_mat,
                     nr_feeds, nr_filtering, per_channel, blocks)
    _mark("fit")
    if extra is not None:
        return out, extra_host
    return out


def apply_gain(comp: ExposureCompensator, index: int, corner, img,
               coord_scale: float = 1.0):
    """compensator->apply(idx, corner, img, mask) at `:1162`.

    Block modes stretch the per-image gain map over the apply-time image
    with cv2::resize INTER_LINEAR semantics (BlocksCompensator::apply) —
    the feed happens at seam scale and the apply at compose scale, and
    OpenCV simply resizes the map to whatever image it is given.
    `corner`/`coord_scale` are accepted for signature stability; per-image
    grids need neither."""
    img = jnp.asarray(img, jnp.float32)
    if comp.comp_type == ECType.NO:
        return img
    if comp.comp_type == ECType.GAIN:
        return img * float(comp.gains[index])
    if comp.comp_type == ECType.CHANNELS:
        return img * jnp.asarray(comp.gains[index],
                                 jnp.float32)[None, None, :]
    gh, gw = (int(comp.grid_sizes[index][0]), int(comp.grid_sizes[index][1]))
    gmap = jnp.asarray(comp.gains[index][:gh, :gw], jnp.float32)
    h, w = img.shape[0], img.shape[1]
    gmap = resize(gmap, (h, w))
    if gmap.ndim == 2:
        gmap = gmap[..., None]
    return img * gmap
