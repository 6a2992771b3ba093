"""Canvas-sharded compositing: the gigapixel path (BASELINE.json config 5).

The panorama canvas is sharded along its width over the mesh's ``sp`` axis
(SURVEY.md section 5: the ring-attention analogue — neighbor halos instead
of KV rings).  Inside `shard_map` each device:

  1. computes the inverse spherical map for ITS canvas slice only (the
     backward warp is embarrassingly spatial — dst pixel -> src coords),
  2. gathers source pixels and accumulates smooth per-image weights
     (separable center-falloff feathering — EDT-free, comm-free),
  3. normalizes locally, then runs a boundary-smoothing blur whose edge
     columns are exchanged with neighbors via `jax.lax.ppermute` (the halo
     exchange that full sharded multi-band blending generalizes).

Inputs are replicated (v1); the output canvas never materializes on one
device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.warps import PROJECTIONS, _backward_xy

__all__ = ["make_sharded_composite"]

_HALO = 2


def _halo_blur(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """5-tap horizontal blur with cross-shard halo exchange.

    x: (H, W_local, C).  Exchanges _HALO edge columns with left/right
    neighbors over `axis_name` (zero pad at the ends of the line).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    left_edge = x[:, :_HALO]
    right_edge = x[:, -_HALO:]
    # Receive my left neighbor's right edge and vice versa.
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)])
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right),
                           from_right)
    xp = jnp.concatenate([from_left, x, from_right], axis=1)
    taps = (1.0 / 16, 4.0 / 16, 6.0 / 16, 4.0 / 16, 1.0 / 16)
    return sum(taps[i] * xp[:, i:i + x.shape[1]] for i in range(5))


def make_sharded_composite(mesh: Mesh, n_images: int,
                           src_hw: Tuple[int, int],
                           canvas_hw: Tuple[int, int],
                           canvas_tl: Tuple[int, int], scale: float,
                           proj_name: str = "spherical",
                           axis: str = "sp"):
    """Build the sharded compositing step.

    Returns fn(images (N, H, W, 3), ks (N, 3, 3), rs (N, 3, 3)) ->
    canvas (Hc, Wc, 3) sharded P(None, axis, None).  Wc must divide by the
    axis size.
    """
    hc, wc = canvas_hw
    n_dev = mesh.shape[axis]
    assert wc % n_dev == 0, (wc, n_dev)
    w_local = wc // n_dev
    h, w = src_hw
    proj_bwd = PROJECTIONS[proj_name][1]

    def local_fn(images, ks, rs):
        sidx = jax.lax.axis_index(axis)
        x0 = canvas_tl[0] + sidx * w_local
        us = x0 + jnp.arange(w_local, dtype=jnp.float32)
        vs = canvas_tl[1] + jnp.arange(hc, dtype=jnp.float32)
        uu, vv = jnp.meshgrid(us, vs)

        def one_image(img, k, r):
            sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
            xi0 = jnp.floor(sx)
            yi0 = jnp.floor(sy)
            fx = (sx - xi0)[..., None]
            fy = (sy - yi0)[..., None]
            xi = jnp.clip(xi0.astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(yi0.astype(jnp.int32), 0, h - 1)
            xi1 = jnp.minimum(xi + 1, w - 1)
            yi1 = jnp.minimum(yi + 1, h - 1)
            i00 = img[yi, xi]
            i01 = img[yi, xi1]
            i10 = img[yi1, xi]
            i11 = img[yi1, xi1]
            val = (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
                   i10 * (1 - fx) * fy + i11 * fx * fy)
            inside = valid & (sx >= 0) & (sx <= w - 1) & (sy >= 0) & \
                (sy <= h - 1)
            # Separable center-falloff feather weight in source coords.
            wx = 1.0 - jnp.abs(2.0 * sx / (w - 1) - 1.0)
            wy = 1.0 - jnp.abs(2.0 * sy / (h - 1) - 1.0)
            wgt = jnp.where(inside, jnp.maximum(wx, 1e-4) *
                            jnp.maximum(wy, 1e-4), 0.0)
            return val * wgt[..., None], wgt

        vals, wgts = jax.vmap(one_image)(images, ks, rs)
        acc = jnp.sum(vals, axis=0)
        wacc = jnp.sum(wgts, axis=0)
        canvas = acc / jnp.maximum(wacc[..., None], 1e-5)
        # Boundary smoothing with true halo exchange across shards.
        return _halo_blur(canvas, axis)

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(None, axis, None))
    return jax.jit(fn)
