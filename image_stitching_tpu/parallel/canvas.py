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

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.warps import PROJECTIONS, _backward_xy

__all__ = ["make_sharded_composite", "make_sharded_multiband"]

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


def make_sharded_multiband(mesh: Mesh, n_images: int,
                           src_hw: Tuple[int, int],
                           canvas_hw: Tuple[int, int],
                           canvas_tl: Tuple[int, int], scale: float,
                           n_bands: int = 3, proj_name: str = "spherical",
                           axis: str = "sp"):
    """Canvas-sharded MULTI-BAND compositing (the gigapixel mode).

    Instead of exchanging pyramid halos between shards, each device
    *recomputes* a margin of width 3 * 2^n_bands around its canvas slice:
    the backward warp is pure math, so any device can evaluate any canvas
    column locally.  Pyramid blurs then never see a shard boundary, ICI
    traffic is zero, and the sharded result equals the single-device
    multiband blend wherever the margin covers the blur's influence radius
    (SURVEY.md section 5: the halo analogue of ring attention, realized as
    overlap-compute).

    Returns fn(images (N, H, W, 3), ks, rs, weights (N, H, W)) ->
    canvas (Hc, Wc, 3) sharded P(None, axis).  `weights` are per-image
    source-space blend masks (e.g. seam masks); Wc divisible by axis size
    and by 2^n_bands.
    """
    from ..ops.blend import WEIGHT_EPS, pyr_down, pyr_up

    hc, wc = canvas_hw
    n_dev = mesh.shape[axis]
    step = 1 << n_bands
    assert wc % n_dev == 0 and (wc // n_dev) % step == 0, (wc, n_dev, step)
    assert hc % step == 0, (hc, step)
    w_local = wc // n_dev
    margin = 3 * step
    w_ext = w_local + 2 * margin
    h, w = src_hw
    proj_bwd = PROJECTIONS[proj_name][1]

    def local_fn(images, ks, rs, weights):
        sidx = jax.lax.axis_index(axis)
        x0 = canvas_tl[0] + sidx * w_local - margin
        us = x0 + jnp.arange(w_ext, dtype=jnp.float32)
        vs = canvas_tl[1] + jnp.arange(hc, dtype=jnp.float32)
        uu, vv = jnp.meshgrid(us, vs)

        def accum(carry, inp):
            accs, waccs = carry
            img, k, r, wgt_src = inp
            sx, sy, valid = _backward_xy(proj_bwd, uu, vv, k, r, scale)
            xi0 = jnp.floor(sx)
            yi0 = jnp.floor(sy)
            fx = (sx - xi0)[..., None]
            fy = (sy - yi0)[..., None]
            xi = jnp.clip(xi0.astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(yi0.astype(jnp.int32), 0, h - 1)
            xi1 = jnp.minimum(xi + 1, w - 1)
            yi1 = jnp.minimum(yi + 1, h - 1)
            val = (img[yi, xi] * (1 - fx) * (1 - fy) +
                   img[yi, xi1] * fx * (1 - fy) +
                   img[yi1, xi] * (1 - fx) * fy +
                   img[yi1, xi1] * fx * fy)
            inside = valid & (sx >= 0) & (sx <= w - 1) & (sy >= 0) & \
                (sy <= h - 1)
            wgt = jnp.where(inside, wgt_src[yi, xi], 0.0)

            gauss = [val]
            wg = [wgt]
            for _ in range(n_bands):
                gauss.append(pyr_down(gauss[-1]))
                wg.append(pyr_down(wg[-1]))
            new_accs = []
            new_waccs = []
            for b in range(n_bands + 1):
                if b < n_bands:
                    lap = gauss[b] - pyr_up(gauss[b + 1],
                                            gauss[b].shape[:2])
                else:
                    lap = gauss[b]
                new_accs.append(accs[b] + lap * wg[b][..., None])
                new_waccs.append(waccs[b] + wg[b])
            return (new_accs, new_waccs), 0

        # Mark the zero-initialized accumulators as varying over the shard
        # axis (the scan body mixes in axis_index-dependent values).
        accs = [jax.lax.pcast(jnp.zeros((hc >> b, w_ext >> b, 3),
                                        jnp.float32), axis, to="varying")
                for b in range(n_bands + 1)]
        waccs = [jax.lax.pcast(jnp.zeros((hc >> b, w_ext >> b),
                                         jnp.float32), axis, to="varying")
                 for b in range(n_bands + 1)]
        (accs, waccs), _ = jax.lax.scan(accum, (accs, waccs),
                                        (images, ks, rs, weights))
        bands = [accs[b] / (waccs[b][..., None] + WEIGHT_EPS)
                 for b in range(n_bands + 1)]
        out = bands[-1]
        for b in range(n_bands - 1, -1, -1):
            out = pyr_up(out, bands[b].shape[:2]) + bands[b]
        # Crop the recomputed margins: the shard keeps only its slice.
        return out[:, margin:margin + w_local, :]

    fn = shard_map(local_fn, mesh=mesh, in_specs=(P(), P(), P(), P()),
                   out_specs=P(None, axis, None))
    return jax.jit(fn)
