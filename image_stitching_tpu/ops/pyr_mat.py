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


def pyr_down_mm(x: jnp.ndarray) -> jnp.ndarray:
    """cv2 pyrDown on (..., H, W) via two banded matmuls."""
    h, w = x.shape[-2], x.shape[-1]
    dh, dw = down_mats(h, w)
    return jnp.einsum("oh,...hw,pw->...op", dh, x, dw)


def pyr_up_mm(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """cv2 pyrUp on (..., h, w) -> (..., out_h, out_w)."""
    uh, uw = up_mats(out_hw[0], out_hw[1], x.shape[-2], x.shape[-1])
    return jnp.einsum("oh,...hw,pw->...op", uh, x, uw)
