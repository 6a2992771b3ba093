"""Shared multi-scale Hessian detector machinery for SURF/AKAZE variants.

Both families rank keypoints by the determinant of the Hessian over a scale
stack; they differ in how the stack is built (SURF: Gaussian/box smoothing;
AKAZE: nonlinear Perona-Malik diffusion) and in descriptors.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

__all__ = ["det_hessian", "diffusion_step", "top_k_keypoints"]


@jax.jit
def det_hessian(img: jnp.ndarray) -> jnp.ndarray:
    """det(H) = Lxx*Lyy - Lxy^2 via central differences."""
    p = jnp.pad(img, 2, mode="edge")
    c = p[2:-2, 2:-2]
    dxx = p[2:-2, 4:] + p[2:-2, :-4] - 2 * c
    dyy = p[4:, 2:-2] + p[:-4, 2:-2] - 2 * c
    dxy = 0.25 * (p[4:, 4:] + p[:-4, :-4] - p[4:, :-4] - p[:-4, 4:])
    return dxx * dyy - dxy * dxy


@jax.jit
def diffusion_step(img: jnp.ndarray, k_contrast: float = 10.0,
                   tau: float = 0.24) -> jnp.ndarray:
    """One explicit Perona-Malik (PM2) diffusion step — the AKAZE-style
    edge-preserving scale-space evolution (FED single step)."""
    p = jnp.pad(img, 1, mode="edge")
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    g = 1.0 / (1.0 + (gx * gx + gy * gy) / (k_contrast * k_contrast))
    gp = jnp.pad(g, 1, mode="edge")
    ip = p
    flux_e = 0.5 * (gp[1:-1, 2:] + g) * (ip[1:-1, 2:] - img)
    flux_w = 0.5 * (gp[1:-1, :-2] + g) * (ip[1:-1, :-2] - img)
    flux_s = 0.5 * (gp[2:, 1:-1] + g) * (ip[2:, 1:-1] - img)
    flux_n = 0.5 * (gp[:-2, 1:-1] + g) * (ip[:-2, 1:-1] - img)
    return img + tau * (flux_e + flux_w + flux_s + flux_n)


def top_k_keypoints(score_maps: List[jnp.ndarray], k_total: int,
                    border: int):
    """3x3 NMS per map, then global top-K over (scale, y, x).

    Returns xy (K, 2), response (K,), scale_idx (K,), valid (K,)."""
    stacked = jnp.stack(score_maps)                 # (S, H, W)
    s, h, w = stacked.shape
    pooled = jax.lax.reduce_window(stacked[..., None], -jnp.inf, jax.lax.max,
                                   (1, 3, 3, 1), (1, 1, 1, 1),
                                   "SAME")[..., 0]
    nms = jnp.where(stacked >= pooled, stacked, 0.0)
    yy = jax.lax.broadcasted_iota(jnp.int32, (s, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (s, h, w), 2)
    inb = ((yy >= border) & (yy < h - border) & (xx >= border) &
           (xx < w - border))
    nms = jnp.where(inb, nms, 0.0)
    vals, idx = jax.lax.top_k(nms.reshape(-1), k_total)
    valid = vals > 0
    sc = (idx // (h * w)).astype(jnp.int32)
    rem = idx % (h * w)
    ky = (rem // w).astype(jnp.float32)
    kx = (rem % w).astype(jnp.float32)
    return jnp.stack([kx, ky], -1), vals, sc, valid
