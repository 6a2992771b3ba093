"""Wave correction: global horizon leveling of the camera rotations.

Replaces cv::detail::waveCorrect as called at
`/root/reference/image_stitching/image_stitching.cpp:721-729`
(WAVE_CORRECT_HORIZ default, `:69`).  Math follows the OpenCV algorithm:

  1. eigendecompose sum_i x_i x_i^T of the camera x-axes; the eigenvector of
     the smallest eigenvalue is the global 'up' (rg1)
  2. rg0 = rg1 x (sum of camera z-axes), normalized; rg2 = rg0 x rg1
  3. sign-fix rg0/rg1 so cameras keep their +x consensus (HORIZ) or
     +y consensus (VERT)
  4. every R <- [rg0 rg1 rg2]^T @ R

Implemented as one jitted function over the stacked (N, 3, 3) rotations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import WaveCorrectKind

__all__ = ["wave_correct"]


def _wave_correct_impl(rmats: jnp.ndarray, horiz: bool) -> jnp.ndarray:
    x_axes = rmats[:, :, 0]                      # (N, 3) R col 0
    z_axes = rmats[:, :, 2]
    moment = jnp.einsum("ni,nj->ij", x_axes, x_axes)
    evals, evecs = jnp.linalg.eigh(moment)       # ascending
    # HORIZ uses the smallest-eigenvalue axis as global 'up'; VERT the
    # largest (cv::detail::waveCorrect picks eigen row 2 vs row 0 of its
    # descending-ordered decomposition).
    rg1 = evecs[:, 0] if horiz else evecs[:, -1]
    img_k = jnp.sum(z_axes, axis=0)
    rg0 = jnp.cross(rg1, img_k)
    rg0 = rg0 / jnp.maximum(jnp.linalg.norm(rg0), 1e-12)
    rg2 = jnp.cross(rg0, rg1)

    if horiz:
        conf = jnp.sum(jnp.einsum("j,nj->n", rg0, x_axes))
        flip = conf < 0
    else:
        # VERT: conf = -sum(rg1 . x_axes); flip when conf < 0.
        conf = -jnp.sum(jnp.einsum("j,nj->n", rg1, x_axes))
        flip = conf < 0
    sign = jnp.where(flip, -1.0, 1.0)
    rg0 = rg0 * sign
    rg1 = rg1 * sign

    r = jnp.stack([rg0, rg1, rg2], axis=0)       # rows
    return jnp.einsum("ij,njk->nik", r, rmats)


_wave_horiz = jax.jit(lambda r: _wave_correct_impl(r, True))
_wave_vert = jax.jit(lambda r: _wave_correct_impl(r, False))


def wave_correct(rmats: jnp.ndarray,
                 kind: WaveCorrectKind = WaveCorrectKind.HORIZ) -> jnp.ndarray:
    """(N, 3, 3) rotations -> corrected rotations.  kind NO returns input.

    AUTO picks HORIZ/VERT by comparing x- vs y-axis spread (OpenCV
    autoDetectWaveCorrectKind simplification)."""
    rmats = jnp.asarray(rmats)
    if kind == WaveCorrectKind.NO:
        return rmats
    if rmats.shape[0] == 0:
        return rmats
    if kind == WaveCorrectKind.AUTO:
        x_spread = jnp.var(rmats[:, :, 0], axis=0).sum()
        y_spread = jnp.var(rmats[:, :, 1], axis=0).sum()
        return jax.lax.cond(x_spread >= y_spread, _wave_horiz, _wave_vert,
                            rmats)
    if kind == WaveCorrectKind.HORIZ:
        return _wave_horiz(rmats)
    return _wave_vert(rmats)
