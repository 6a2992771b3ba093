"""Exposure compensation: NO / GAIN / GAIN_BLOCKS / CHANNELS / CHANNELS_BLOCKS.

Replaces cv::detail::ExposureCompensator configured at
`/root/reference/image_stitching/image_stitching.cpp:73-76, :1002-1023`
(GAIN_BLOCKS default, nr_feeds=1, nr_filtering=2, block=64) and applied per
image at `:1162`.

TPU-first redesign (not a port of OpenCV's per-pair pixel loops):
  * every warped image is placed on the global canvas grid; overlap
    statistics become batched masked reductions over canvas *cells*
    (cell = block for *_BLOCKS, cell = whole canvas otherwise);
  * the pairwise gain system — the standard least squares
      sum_ij N_ij [ alpha (g_i I_ij - g_j I_ji)^2 + beta (1 - g_i)^2 ]
    with OpenCV's alpha=0.01, beta=100 — is assembled as one batched
    (cells, N, N) matrix and solved with one batched `jnp.linalg.solve`;
    with canvas-aligned cells the global block system decouples per cell,
    which is what makes this formulation equivalent to OpenCV's
    all-blocks-one-system solve while running as pure dense linear algebra;
  * block gain maps are mean-filtered `nr_filtering` times (separable
    [1 2 1]/4, OpenCV's gain filtering) and bilinearly upsampled onto each
    image ROI at apply time.

Intensity is the L2 norm of the RGB triple (OpenCV GainCompensator uses
norm(Vec3b)); CHANNELS variants solve the same system per channel.

Parity (decoded numerically against cv2.detail): GAIN and CHANNELS gains
match GainCompensator / ChannelsCompensator to ~1e-4 (vec-norm intensity,
self-count N(i,i) in the beta prior terms only, factor-2 alpha terms).
The *_BLOCKS variants keep the canvas-anchored decoupled cell grid (a
deliberate TPU-friendly delta vs cv2's per-image block grids); applied
output agrees to a few percent (tested in tests/test_ops.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExposureCompensatorType as ECType
from .warps import result_roi

__all__ = ["ExposureCompensator", "feed", "apply_gain"]

_ALPHA = 0.01
_BETA = 100.0


@dataclasses.dataclass
class ExposureCompensator:
    """Fitted gains.  For block types, `gains` is (N, Gy, Gx[, C]); for
    global types, (N[, C]).  `canvas_roi` anchors the cell grid."""
    comp_type: ECType
    gains: np.ndarray
    canvas_roi: Tuple[int, int, int, int]
    block_size: int


def _solve_gain_system(n_pix: jnp.ndarray, i_mean: jnp.ndarray) -> jnp.ndarray:
    """n_pix: (..., N, N) overlap pixel counts; i_mean: (..., N, N) mean
    intensity of image i over overlap(i, j).  Returns (..., N) gains."""
    n = n_pix.shape[-1]
    i_ij = i_mean
    i_ji = jnp.swapaxes(i_mean, -1, -2)
    # Decoded numerically against cv2.detail.GainCompensator: the
    # self-overlap N(i,i) (the image's own pixel count) appears in the
    # beta prior terms (both A(i,i) and b(i)) but NOT in the alpha
    # exposure-difference terms, and the alpha terms carry a factor 2.
    npix = n_pix * (1.0 - jnp.eye(n))
    a = -2.0 * _ALPHA * i_ij * i_ji * npix
    diag = (_BETA * jnp.sum(n_pix, axis=-1) +
            2.0 * _ALPHA * jnp.sum(i_ij * i_ij * npix, axis=-1))
    a = a * (1.0 - jnp.eye(n)) + jnp.eye(n) * diag[..., None, :] * 0.0
    a = a.at[..., jnp.arange(n), jnp.arange(n)].set(diag)
    b = _BETA * jnp.sum(n_pix, axis=-1)
    # Images absent from a cell get an identity row -> gain 1.
    reg = jnp.where(diag < 1e-6, 1.0, 0.0)
    a = a + jnp.eye(n) * reg[..., None, :]
    b = b + reg
    return jnp.linalg.solve(a, b[..., None])[..., 0]


@functools.partial(jax.jit, static_argnames=("cell", "per_channel"))
def _cell_stats(canvas_vals: jnp.ndarray, canvas_mask: jnp.ndarray,
                cell: int, per_channel: bool):
    """canvas_vals: (N, H, W[, C]) intensity (or channels);
    canvas_mask: (N, H, W) in {0,1}.  Returns per-cell pairwise stats:
    n_pix (G, N, N), i_mean (G, N, N[, C])."""
    n, h, w = canvas_mask.shape
    gy, gx = h // cell, w // cell
    p = cell * cell
    m = canvas_mask.reshape(n, gy, cell, gx, cell)
    m = m.transpose(1, 3, 0, 2, 4).reshape(gy * gx, n, p)
    n_pix = jax.lax.dot_general(
        m.astype(jnp.bfloat16), m.astype(jnp.bfloat16),
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)

    def one_channel(vals):
        v = vals.reshape(n, gy, cell, gx, cell)
        v = v.transpose(1, 3, 0, 2, 4).reshape(gy * gx, n, p)
        vm = (v * m)
        i_sum = jax.lax.dot_general(
            vm.astype(jnp.bfloat16), m.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        return i_sum / jnp.maximum(n_pix, 1.0)

    if per_channel:
        i_mean = jnp.stack([one_channel(canvas_vals[..., c])
                            for c in range(canvas_vals.shape[-1])], axis=-1)
    else:
        i_mean = one_channel(canvas_vals)
    return n_pix, i_mean


def _place_on_canvas(images: Sequence[np.ndarray],
                     masks: Sequence[np.ndarray],
                     corners: Sequence[Tuple[int, int]],
                     canvas_roi, cell: int, per_channel: bool):
    """Host-side paste into (N, Hc, Wc) canvases (intensity or channels +
    mask), padded up to a multiple of `cell`.  Only the representation the
    fit needs is built (the RGB canvas stack is 3x the upload)."""
    cx, cy, cw, ch = canvas_roi
    hc = -(-ch // cell) * cell
    wc = -(-cw // cell) * cell
    n = len(images)
    shape = (n, hc, wc, 3) if per_channel else (n, hc, wc)
    vals = np.zeros(shape, np.float32)
    msk = np.zeros((n, hc, wc), np.float32)
    for i, (img, m, (x, y)) in enumerate(zip(images, masks, corners)):
        img = np.asarray(img, np.float32)
        m = (np.asarray(m) > 0).astype(np.float32)
        hh, ww = img.shape[:2]
        oy, ox = y - cy, x - cx
        if per_channel:
            vals[i, oy:oy + hh, ox:ox + ww] = img
        else:
            vals[i, oy:oy + hh, ox:ox + ww] = np.linalg.norm(img, axis=-1)
        msk[i, oy:oy + hh, ox:ox + ww] = m
    return vals, msk


def _filter_gain_map(gmap: jnp.ndarray, iters: int) -> jnp.ndarray:
    """(N, Gy, Gx[, C]) separable [1 2 1]/4 smoothing, `iters` times,
    edge-replicated (BlocksCompensator gain filtering)."""
    def blur(x):
        xp = jnp.pad(x, [(0, 0), (1, 1), (0, 0)] + [(0, 0)] * (x.ndim - 3),
                     mode="edge")
        x = 0.25 * xp[:, :-2] + 0.5 * xp[:, 1:-1] + 0.25 * xp[:, 2:]
        xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1)] + [(0, 0)] * (x.ndim - 3),
                     mode="edge")
        return 0.25 * xp[:, :, :-2] + 0.5 * xp[:, :, 1:-1] + 0.25 * xp[:, :, 2:]
    for _ in range(iters):
        gmap = blur(gmap)
    return gmap


def feed(corners, images_warped, masks_warped,
         comp_type: ECType = ECType.GAIN_BLOCKS, nr_feeds: int = 1,
         nr_filtering: int = 2, block_size: int = 64) -> ExposureCompensator:
    """Fit the compensator (compensator->feed at `:1023`)."""
    sizes = [(img.shape[1], img.shape[0]) for img in images_warped]
    canvas = result_roi(corners, sizes)
    if comp_type == ECType.NO:
        return ExposureCompensator(comp_type, np.ones(len(images_warped)),
                                   canvas, block_size)

    blocks = comp_type in (ECType.GAIN_BLOCKS, ECType.CHANNELS_BLOCKS)
    per_channel = comp_type in (ECType.CHANNELS, ECType.CHANNELS_BLOCKS)
    cx, cy, cw, ch = canvas
    cell = block_size if blocks else max(
        1, 1 << int(np.ceil(np.log2(max(cw, ch)))))
    vals, msk = _place_on_canvas(images_warped, masks_warped, corners,
                                 canvas, cell, per_channel)
    src = vals
    cur_gains = None
    for _ in range(max(1, nr_feeds)):
        n_pix, i_mean = _cell_stats(jnp.asarray(src), jnp.asarray(msk), cell,
                                    per_channel)
        if per_channel:
            g = jnp.stack([
                _solve_gain_system(n_pix, i_mean[..., c])
                for c in range(3)], axis=-1)          # (G, N, C)
        else:
            g = _solve_gain_system(n_pix, i_mean)      # (G, N)
        cur_gains = g if cur_gains is None else cur_gains * g
        if nr_feeds > 1:
            # Re-feed on gain-corrected intensities.
            gy = msk.shape[1] // cell
            gx = msk.shape[2] // cell
            gmap = np.asarray(g).reshape(gy, gx, len(images_warped), -1)
            gmap = np.transpose(gmap, (2, 0, 1, 3))
            up = np.repeat(np.repeat(gmap, cell, 1), cell, 2)
            src = src * (up[..., 0] if not per_channel else up)

    n_img = len(images_warped)
    gy = msk.shape[1] // cell
    gx = msk.shape[2] // cell
    g = np.asarray(cur_gains)
    if per_channel:
        g = g.reshape(gy, gx, n_img, 3).transpose(2, 0, 1, 3)
    else:
        g = g.reshape(gy, gx, n_img).transpose(2, 0, 1)
    if blocks:
        g = np.asarray(_filter_gain_map(jnp.asarray(g), nr_filtering))
        return ExposureCompensator(comp_type, g, canvas, cell)
    # Global types: average the (single) cell grid down to one gain/image.
    g = g.reshape(n_img, -1, g.shape[-1]).mean(1) if per_channel else \
        g.reshape(n_img, -1).mean(1)
    return ExposureCompensator(comp_type, g, canvas, cell)


@functools.partial(jax.jit, static_argnames=("cell",))
def _apply_block_gain(img: jnp.ndarray, gmap: jnp.ndarray,
                      corner: jnp.ndarray, canvas_tl: jnp.ndarray,
                      coord_scale: jnp.ndarray, cell: int) -> jnp.ndarray:
    """Bilinear-sample the cell-grid gain map over the image ROI.

    Pixel (x, y) of a warped image anchored at `corner` maps to gain-grid
    coords ((corner + p) * coord_scale - canvas_tl) / cell."""
    h, w = img.shape[:2]
    gy, gx = gmap.shape[0], gmap.shape[1]
    ys = ((corner[1] + jnp.arange(h, dtype=jnp.float32) + 0.5) *
          coord_scale - canvas_tl[1]) / cell - 0.5
    xs = ((corner[0] + jnp.arange(w, dtype=jnp.float32) + 0.5) *
          coord_scale - canvas_tl[0]) / cell - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, gy - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, gx - 1)
    fy = jnp.clip(ys - y0, 0, 1)[:, None]
    fx = jnp.clip(xs - x0, 0, 1)[None, :]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, gy - 1)
    x1i = jnp.minimum(x0i + 1, gx - 1)
    g00 = gmap[y0i[:, None], x0i[None, :]]
    g01 = gmap[y0i[:, None], x1i[None, :]]
    g10 = gmap[y1i[:, None], x0i[None, :]]
    g11 = gmap[y1i[:, None], x1i[None, :]]
    if gmap.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    g = (g00 * (1 - fy) * (1 - fx) + g01 * (1 - fy) * fx +
         g10 * fy * (1 - fx) + g11 * fy * fx)
    if gmap.ndim == 2:
        g = g[..., None]
    return img.astype(jnp.float32) * g


def apply_gain(comp: ExposureCompensator, index: int, corner, img,
               coord_scale: float = 1.0):
    """compensator->apply(idx, corner, img, mask) at `:1162`.

    `coord_scale` maps the image's warped coordinates into the frame the
    gains were fitted in (the feed happens at seam scale, the apply at
    compose scale — `:1023` vs `:1162`; warped coords are proportional to
    the warper scale, so the ratio is seam/compose warp scale)."""
    img = jnp.asarray(img, jnp.float32)
    if comp.comp_type == ECType.NO:
        return img
    if comp.comp_type == ECType.GAIN:
        return img * float(comp.gains[index])
    if comp.comp_type == ECType.CHANNELS:
        return img * jnp.asarray(comp.gains[index])[None, None, :]
    gmap = jnp.asarray(comp.gains[index])
    return _apply_block_gain(
        img, gmap,
        jnp.asarray([corner[0], corner[1]], jnp.float32),
        jnp.asarray([comp.canvas_roi[0], comp.canvas_roi[1]], jnp.float32),
        jnp.float32(coord_scale), comp.block_size)
