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
# same banded product runs TILED: reflect-pad once, then every _TILE
# outputs are one shared (TILE, 2*TILE+4) local-stencil matmul over an
# overlapping input window — identical <=5-term sums, O(n*TILE) FLOPs,
# one ~0.5 MB constant shared by every axis length.
_T_DENSE = 4096
_TILE = 256


@functools.lru_cache(maxsize=None)
def _down_local_np() -> np.ndarray:
    m = np.zeros((_TILE, 2 * _TILE + 4), np.float64)
    for o in range(_TILE):
        for j in range(5):
            m[o, 2 * o + j] += _K5[j]
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _up_local_np() -> np.ndarray:
    m = np.zeros((_TILE, _TILE + 4), np.float64)
    for o in range(_TILE):
        for j in range(5):
            m[o, o + j] += 2.0 * _K5[j]
    return m.astype(np.float32)


def _pad_last(x, lo: int, hi: int, mode: str = "constant"):
    pad = [(0, 0)] * (x.ndim - 1) + [(lo, hi)]
    return jnp.pad(x, pad, mode=mode)


def _windows_last(xp, stride: int, length: int, n_tiles: int):
    """Overlapping windows (static slices) -> (..., n_tiles, length)."""
    return jnp.stack([xp[..., i * stride: i * stride + length]
                      for i in range(n_tiles)], axis=-2)


def _down_last(x):
    """pyrDown along the last axis only."""
    n = x.shape[-1]
    n_half = (n + 1) // 2
    if n <= _T_DENSE:
        return jnp.einsum("...w,ow->...o", x, jnp.asarray(_down_mat_np(n)))
    # jnp reflect pad == BORDER_REFLECT_101 (edge excluded).
    xp = _pad_last(x, 2, 2, mode="reflect")
    nt = -(-n_half // _TILE)
    need = 2 * nt * _TILE + 4
    if need > n + 4:
        xp = _pad_last(xp, 0, need - (n + 4))
    tiles = _windows_last(xp, 2 * _TILE, 2 * _TILE + 4, nt)
    y = jnp.einsum("ot,...nt->...no", jnp.asarray(_down_local_np()), tiles)
    return y.reshape(*x.shape[:-1], nt * _TILE)[..., :n_half]


def _up_last(x, n_out: int):
    """pyrUp along the last axis only (zero-stuff -> blur -> x2)."""
    n_in = x.shape[-1]
    if n_out <= _T_DENSE:
        return jnp.einsum("...w,ow->...o", x,
                          jnp.asarray(_up_mat_np(n_out, n_in)))
    stuffed = jnp.stack([x, jnp.zeros_like(x)], axis=-1
                        ).reshape(*x.shape[:-1], 2 * n_in)
    if n_out > 2 * n_in:
        stuffed = _pad_last(stuffed, 0, n_out - 2 * n_in)
    sp = _pad_last(stuffed[..., :n_out], 2, 2, mode="reflect")
    nt = -(-n_out // _TILE)
    need = nt * _TILE + 4
    if need > n_out + 4:
        sp = _pad_last(sp, 0, need - (n_out + 4))
    tiles = _windows_last(sp, _TILE, _TILE + 4, nt)
    y = jnp.einsum("ot,...nt->...no", jnp.asarray(_up_local_np()), tiles)
    return y.reshape(*x.shape[:-1], nt * _TILE)[..., :n_out]


def _swap(x):
    return jnp.swapaxes(x, -1, -2)


def pyr_down_mm(x: jnp.ndarray) -> jnp.ndarray:
    """cv2 pyrDown on (..., H, W) via banded matrix products."""
    h, w = x.shape[-2], x.shape[-1]
    if max(h, w) <= _T_DENSE:
        dh, dw = down_mats(h, w)
        return jnp.einsum("oh,...hw,pw->...op", dh, x, dw)
    return _down_last(_swap(_down_last(_swap(x))))


def pyr_up_mm(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """cv2 pyrUp on (..., h, w) -> (..., out_h, out_w)."""
    if max(out_hw[0], out_hw[1]) <= _T_DENSE:
        uh, uw = up_mats(out_hw[0], out_hw[1], x.shape[-2], x.shape[-1])
        return jnp.einsum("oh,...hw,pw->...op", uh, x, uw)
    return _up_last(_swap(_up_last(_swap(x), out_hw[0])), out_hw[1])
