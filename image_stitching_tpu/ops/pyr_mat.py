"""cv2 pyrDown/pyrUp as banded matrix products (MXU formulation).

The multiband blend pyramid (`ops/blend.py::pyr_down/pyr_up`, semantics of
cv2 pyrDown/pyrUp at `/root/reference/image_stitching/image_stitching.cpp`
via `cv::detail::MultiBandBlender`) is a separable 5-tap
[1,4,6,4,1]/16 blur with BORDER_REFLECT_101 plus 2x decimate/zero-stuff.
On TPU the natural home for that is the MXU: fold (reflect-pad -> blur ->
decimate) into one banded matrix per axis, so

    pyr_down(x) = D_h @ x @ D_w^T        x: (..., H, W)
    pyr_up(x)   = U_h @ x @ U_w^T

Each output element is a <=5-term weighted sum, identical math to the
separable form up to f32 summation order.  This sidesteps the
strided-slice / interleave reshapes that lower poorly both in Mosaic and
in XLA scan bodies, and it is layout-friendly: planar (C, H, W) operands
keep the lane dimension wide instead of burying a 3-wide channel minor.

The matrices are tiny ((H/2, H) etc.), cached per shape, exact in bf16
(all weights are sums of powers of two: {1,4,6,4,1}/16 and x2 variants).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["down_mats", "up_mats", "pyr_down_mm", "pyr_up_mm"]

_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float64) / 16.0


def _reflect101(i: int, n: int) -> int:
    """OpenCV BORDER_REFLECT_101 index fold (gfedcb|abcdefgh|gfedcba)."""
    if n == 1:
        return 0
    period = 2 * (n - 1)
    i = i % period
    if i < 0:
        i += period
    return i if i < n else period - i


@functools.lru_cache(maxsize=None)
def _down_mat_np(n: int) -> np.ndarray:
    """((n+1)//2, n): rows = 5-tap blur at even positions, REFLECT_101."""
    m = np.zeros(((n + 1) // 2, n), np.float64)
    for o in range((n + 1) // 2):
        for j in range(5):
            m[o, _reflect101(2 * o + j - 2, n)] += _K5[j]
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _up_mat_np(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in): zero-stuff n_in->n_out (trim), blur, x2 per axis.

    Matches ops/blend.py::pyr_up: stuffed[t] = x[t//2] for even t (length
    n_out after trim), then 5-tap REFLECT_101 blur over the stuffed axis,
    times 2 (pyrUp's x4 split as x2 per separable pass).
    """
    m = np.zeros((n_out, n_in), np.float64)
    for o in range(n_out):
        for j in range(5):
            t = _reflect101(o + j - 2, n_out)
            if t % 2 == 0 and t // 2 < n_in:
                m[o, t // 2] += 2.0 * _K5[j]
    return m.astype(np.float32)


def down_mats(h: int, w: int):
    """(D_h (h//2, h), D_w (w//2, w)) as jnp f32 constants."""
    return jnp.asarray(_down_mat_np(h)), jnp.asarray(_down_mat_np(w))


def up_mats(out_h: int, out_w: int, in_h: int, in_w: int):
    return (jnp.asarray(_up_mat_np(out_h, in_h)),
            jnp.asarray(_up_mat_np(out_w, in_w)))


# ---------------------------------------------------------------- tiled ----
# The dense matrices are (n/2, n): at canvas scale that is O(n^2/2) baked
# HLO constants and O(n/10)x wasted MACs — a 28k-px mosaic canvas bakes a
# 1.6 GB up-matrix (the axon remote-compile tunnel rejects the request
# with HTTP 413) and the rig37 canvas a 94 MB one.  Above _T_DENSE the
# same banded product runs TILED: every _TILE outputs are one shared
# local-stencil matmul over NON-overlapping input tiles plus tiny halo
# terms — identical <=5-term sums, O(n*TILE) FLOPs, small shared
# constants.
#
# r05 rework (chip-measured): the original tiled path built overlapping
# (TILE+4)-wide windows by stacking 18 strided slices and, for pyrUp,
# materialized a zero-stuffed lane-interleave first — both lower
# catastrophically on TPU (117 ms for ONE (4, 4096, 4608) pyr_up; the
# interleave alone 118 ms; the window stack 109 ms).  The rework:
#   * input tiles come from FREE reshapes (lane-aligned minor dims);
#     halos are narrow shifted slices; windows are never materialized —
#     the stencil matrix splits into (body, halo) parts and the product
#     is a sum of einsums;
#   * pyrUp folds the zero-stuffing PARITY into the stencil matrix (out
#     tile of T reads x locals [-1, H] with H = T/2): no stuffed array,
#     no lane interleave;
#   * row-axis variants contract the tile axis directly
#     ("ot,...ntw->...now") — no transposes.
# Same-shape A/B after: pyr_up 117.7 -> see NOTES_r05; exactness pinned
# by tests/test_pyr_tiled.py against the dense matrices.
_T_DENSE = 4096
_TILE = 256


@functools.lru_cache(maxsize=None)
def _down_split_np():
    """Down stencil split into (body (T, 2T), tail (T, 4)) parts: output
    local o of a tile reads xp[2o + j] (xp = reflect-2-padded input, tile
    window starts at 2iT); columns < 2T live in the tile body, the last 4
    in the next tile's head."""
    body = np.zeros((_TILE, 2 * _TILE), np.float64)
    tail = np.zeros((_TILE, 4), np.float64)
    for o in range(_TILE):
        for j in range(5):
            c = 2 * o + j
            if c < 2 * _TILE:
                body[o, c] += _K5[j]
            else:
                tail[o, c - 2 * _TILE] += _K5[j]
    return body.astype(np.float32), tail.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _up_split_np():
    """Up stencil with the zero-stuffing PARITY folded in, split into
    (prev (T, 1), body (T, H), next (T, 1)) with H = T/2: output local t
    reads x local m = (t + j - 2) / 2 for even t + j, m in [-1, H]."""
    h = _TILE // 2
    prev = np.zeros((_TILE, 1), np.float64)
    body = np.zeros((_TILE, h), np.float64)
    nxt = np.zeros((_TILE, 1), np.float64)
    for o in range(_TILE):
        for j in range(5):
            if (o + j) % 2 != 0:
                continue
            m = (o + j - 2) // 2
            if m < 0:
                prev[o, 0] += 2.0 * _K5[j]
            elif m < h:
                body[o, m] += 2.0 * _K5[j]
            else:
                nxt[o, 0] += 2.0 * _K5[j]
    return (prev.astype(np.float32), body.astype(np.float32),
            nxt.astype(np.float32))


def _pad_axis(x, lo: int, hi: int, axis: int, mode: str = "constant"):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    return jnp.pad(x, pad, mode=mode)


def _tiles_axis(xq, start: int, tile: int, n_tiles: int, width: int,
                axis: int):
    """(n_tiles, width) leading slices of each stride-`tile` window of
    `xq` along `axis`, built from ONE contiguous slice + a free reshape
    (no per-window strided copies).  Requires xq length >= start +
    n_tiles * tile along axis (zero-padding beyond is the caller's
    garbage-safe region)."""
    idx = xq.ndim + axis if axis < 0 else axis
    sl = [slice(None)] * xq.ndim
    sl[idx] = slice(start, start + n_tiles * tile)
    body = xq[tuple(sl)]
    shape = list(body.shape)
    shape[idx:idx + 1] = [n_tiles, tile]
    body = body.reshape(shape)
    if width < tile:
        sl3 = [slice(None)] * body.ndim
        sl3[idx + 1] = slice(0, width)
        body = body[tuple(sl3)]
    return body


def _down_axis(x, axis: int):
    """pyrDown along `axis` (-1 or -2) via tile-reshape + split matmuls."""
    n = x.shape[axis]
    n_half = (n + 1) // 2
    if n <= _T_DENSE:
        m = jnp.asarray(_down_mat_np(n))
        if axis == -1:
            return jnp.einsum("...w,ow->...o", x, m)
        return jnp.einsum("ot,...tw->...ow", m, x)
    a_body, a_tail = (jnp.asarray(m) for m in _down_split_np())
    nt = -(-n_half // _TILE)
    # reflect-2 pad (jnp reflect == BORDER_REFLECT_101), zero-pad so the
    # last tile's body and tail slices exist; zeros only feed outputs
    # >= n_half, which are sliced off.
    # The shifted tail slice reads one tile beyond the body.
    need = 2 * (nt + 1) * _TILE
    xq = _pad_axis(x, 2, 2, axis, mode="reflect")
    if need > n + 4:
        xq = _pad_axis(xq, 0, need - (n + 4), axis)
    body = _tiles_axis(xq, 0, 2 * _TILE, nt, 2 * _TILE, axis)
    tail = _tiles_axis(xq, 2 * _TILE, 2 * _TILE, nt, 4, axis)
    if axis == -1:
        y = (jnp.einsum("ot,...nt->...no", a_body, body)
             + jnp.einsum("ot,...nt->...no", a_tail, tail))
        y = y.reshape(*x.shape[:-1], nt * _TILE)
        return y[..., :n_half]
    y = (jnp.einsum("ot,...ntw->...now", a_body, body)
         + jnp.einsum("ot,...ntw->...now", a_tail, tail))
    y = y.reshape(*x.shape[:-2], nt * _TILE, x.shape[-1])
    return y[..., :n_half, :]


def _up_axis(x, n_out: int, axis: int):
    """pyrUp along `axis` (-1 or -2): parity-folded stencil, no stuffed
    intermediate.  Supports n_out in {2*n_in, 2*n_in - 1} (the pyramid
    callers' only shapes) on the tiled path."""
    n_in = x.shape[axis]
    if n_out <= _T_DENSE:
        m = jnp.asarray(_up_mat_np(n_out, n_in))
        if axis == -1:
            return jnp.einsum("...w,ow->...o", x, m)
        return jnp.einsum("ot,...tw->...ow", m, x)
    assert n_out in (2 * n_in, 2 * n_in - 1), (n_out, n_in)
    a_prev, a_body, a_nxt = (jnp.asarray(m) for m in _up_split_np())
    h = _TILE // 2
    nt = -(-n_out // _TILE)
    # Edge values with REFLECT_101 on the stuffed axis: left pad is
    # stuffed[-2] = x[1]; right pad is stuffed[n_out or n_out+1]
    # (whichever is even) = x[-1] for even n_out, x[-2] for odd.
    sl = [slice(None)] * x.ndim

    def take(a, b):
        s = list(sl)
        s[axis] = slice(a, b)
        return x[tuple(s)]
    left = take(1, 2)
    right = take(n_in - 1, n_in) if n_out % 2 == 0 else take(n_in - 2,
                                                             n_in - 1)
    xe = jnp.concatenate([left, x, right], axis=axis)
    need = 1 + (nt + 1) * h
    if need > n_in + 2:
        xe = _pad_axis(xe, 0, need - (n_in + 2), axis)
    prev = _tiles_axis(xe, 0, h, nt, 1, axis)
    body = _tiles_axis(xe, 1, h, nt, h, axis)
    nxt = _tiles_axis(xe, 1 + h, h, nt, 1, axis)
    if axis == -1:
        y = (jnp.einsum("ot,...nt->...no", a_body, body)
             + jnp.einsum("ot,...nt->...no", a_prev, prev)
             + jnp.einsum("ot,...nt->...no", a_nxt, nxt))
        y = y.reshape(*x.shape[:-1], nt * _TILE)
        return y[..., :n_out]
    y = (jnp.einsum("ot,...ntw->...now", a_body, body)
         + jnp.einsum("ot,...ntw->...now", a_prev, prev)
         + jnp.einsum("ot,...ntw->...now", a_nxt, nxt))
    y = y.reshape(*x.shape[:-2], nt * _TILE, x.shape[-1])
    return y[..., :n_out, :]


def pyr_down_mm(x: jnp.ndarray) -> jnp.ndarray:
    """cv2 pyrDown on (..., H, W) via banded matrix products."""
    h, w = x.shape[-2], x.shape[-1]
    if max(h, w) <= _T_DENSE:
        dh, dw = down_mats(h, w)
        return jnp.einsum("oh,...hw,pw->...op", dh, x, dw)
    return _down_axis(_down_axis(x, -1), -2)


def pyr_up_mm(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """cv2 pyrUp on (..., h, w) -> (..., out_h, out_w)."""
    if max(out_hw[0], out_hw[1]) <= _T_DENSE:
        uh, uw = up_mats(out_hw[0], out_hw[1], x.shape[-2], x.shape[-1])
        return jnp.einsum("oh,...hw,pw->...op", uh, x, uw)
    return _up_axis(_up_axis(x, out_hw[1], -1), out_hw[0], -2)
