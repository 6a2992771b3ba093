"""Pallas TPU kernel: backward-warp bilinear image sampling as MXU work.

Covers the compose-path image sample (`pipeline/compose_fused.py::
_warp_gain_seam`), the last per-pixel gather in the fused compose program
(reference hot loop `image_stitching.cpp:1154`, the `warper->warp` remap
at compose scale).  XLA lowers the 4-scalar-gather bilinear sample to
~7 ns/descriptor of serialized gather issue — 101 ms at bench shapes
(NOTES_r02).  This kernel removes the gather entirely:

  out[v, u] = sum_y w_y(v,u,y) * sum_x w_x(v,u,x) * img[y, x]

with w the 2-tap bilinear hats.  Per output row-of-tile the horizontal
contraction is a dense (3S, W_SRC) @ (W_SRC, TW) matmul against the 1-D
interpolation matrix built in VMEM (`max(0, 1 - |x - sx(u)|)` — the
`_interp_matrix` trick, exact), and the vertical contraction is a masked
weighted sum over the S-row strip.  One source CHANNEL plane at a time
stays VMEM-resident (the channel is the outermost grid dimension), the
strip/window are dynamic slices of it, and no HBM gather descriptors are
ever issued.  Admissible sources are bounded by one padded channel
plane fitting the VMEM budget (~12 MB -> ~3 MP/channel).

Coordinate semantics: sx/sy must be pre-clamped to [0, wc-1] x [0, hc-1]
(clamp-to-edge).  For samples inside the warp-validity mask this equals
the BORDER_REFLECT path (see `_patch_bilinear`'s proof); far
out-of-range samples differ only in masked-out smear content.

Window preconditions (checked by the host wrapper on a coarse grid of
the analytic warp): within any 8-row x 128-col output tile row, the
source x-span must fit W_SRC-2 and the y-span S-2.  Violations fall
back to the XLA gather path — correctness never depends on the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_bilinear_pallas", "tile_spans_ok"]

TH = 8          # output tile rows
TW = 128        # output tile cols (lane width)


def _kernel(sx_ref, sy_ref, img_ref, out_ref, *, s_rows: int, w_src: int,
            hc_p: int, wc_p: int):
    """One (TH, TW) output tile of ONE channel: per row, strip slice +
    interp matmul.

    img_ref is a single (1, hc_p, wc_p) channel block — the channel is
    a grid dimension (outermost, so each channel streams into VMEM once
    per kernel run), which caps VMEM at one channel plane instead of
    three and triples the admissible source size.  Strip offsets are
    floor-aligned to the (8, 128) tile grid — Mosaic requires aligned
    dynamic vector loads — so the windows carry an extra (8, 128) of
    slack accounted for in `tile_spans_ok`."""
    for r in range(TH):
        sxr = sx_ref[r, :]                                    # (TW,)
        syr = sy_ref[r, :]
        x_lo = jnp.floor(jnp.min(sxr)).astype(jnp.int32)
        y_lo = jnp.floor(jnp.min(syr)).astype(jnp.int32)
        x_lo = jnp.clip((x_lo // 128) * 128, 0, wc_p - w_src)
        y_lo = jnp.clip((y_lo // 8) * 8, 0, hc_p - s_rows)
        x_lo = pl.multiple_of(x_lo, 128)
        y_lo = pl.multiple_of(y_lo, 8)
        strip = img_ref[0, pl.ds(y_lo, s_rows), pl.ds(x_lo, w_src)]
        # Horizontal bilinear as a dense interp-matrix matmul (exact:
        # 2-tap hat weights; out-of-window columns have weight 0 by the
        # host's span precondition).
        xi = jax.lax.broadcasted_iota(jnp.int32, (w_src, TW), 0
                                      ).astype(jnp.float32)
        mx = jnp.maximum(0.0, 1.0 - jnp.abs(
            xi + x_lo.astype(jnp.float32) - sxr[None, :]))
        rv = jnp.dot(strip, mx,
                     preferred_element_type=jnp.float32)      # (S, TW)
        yi = jax.lax.broadcasted_iota(jnp.int32, (s_rows, TW), 0
                                      ).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            yi + y_lo.astype(jnp.float32) - syr[None, :]))
        out_ref[0, r, :] = jnp.sum(rv * wy, axis=0)


@functools.partial(jax.jit, static_argnames=("s_rows", "w_src",
                                             "interpret"))
def warp_bilinear_pallas(img_planar: jnp.ndarray, sx: jnp.ndarray,
                         sy: jnp.ndarray, *, s_rows: int = 40,
                         w_src: int = 384,
                         interpret: bool = False) -> jnp.ndarray:
    """Bilinear-sample `img_planar` (3, hc, wc) f32 at (sx, sy) (H, W).

    Returns (3, H, W) f32.  sx/sy are pre-clamped to the valid source
    range by the caller; H/W are padded up to (TH, TW) multiples here
    and cropped on return.  `s_rows`/`w_src` bound the per-tile-row
    source window (see module docstring)."""
    c, hc, wc = img_planar.shape
    assert c == 3
    h, w = sx.shape
    hp = -(-h // TH) * TH
    wp = -(-w // TW) * TW
    # Pad the source so strip/window slices and the x0+1 tap stay in
    # bounds (zero pad columns only ever receive weight 0).
    hc_p = max(-(-hc // 8) * 8, s_rows)
    wc_p = max(-(-wc // 128) * 128, w_src)
    img_p = jnp.pad(img_planar,
                    ((0, 0), (0, hc_p - hc), (0, wc_p - wc)))
    # Edge-pad the coordinate fields: zero padding would mix far-away
    # coords into an edge tile's min() and blow its source window.
    # (Manual edge pad: jnp.pad(mode="edge") with a zero-width dim hits
    # a jax lowering KeyError as of jax 0.8.x.)
    def edge_pad(a, dh, dw):
        if dh:
            a = jnp.concatenate([a, jnp.tile(a[-1:], (dh, 1))], axis=0)
        if dw:
            a = jnp.concatenate([a, jnp.tile(a[:, -1:], (1, dw))], axis=1)
        return a
    sx_p = edge_pad(sx, hp - h, wp - w)
    sy_p = edge_pad(sy, hp - h, wp - w)

    # Channel as the OUTERMOST grid dim: the (1, hc_p, wc_p) channel
    # block streams into VMEM once per kernel run (consecutive (i, j)
    # steps reuse it), so peak VMEM is one channel plane — a 3x higher
    # source-size ceiling than the old channel-stacked resident image.
    grid = (3, hp // TH, wp // TW)
    out = pl.pallas_call(
        functools.partial(_kernel, s_rows=s_rows, w_src=w_src,
                          hc_p=hc_p, wc_p=wc_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TH, TW), lambda c, i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW), lambda c, i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc_p, wc_p), lambda c, i, j: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, TW), lambda c, i, j: (c, i, j),
                               memory_space=pltpu.VMEM),
        # NB: not usable under shard_map with check_vma=True — the kernel
        # trace mixes varying refs with literal indices, which the vma
        # checker rejects.  Callers embedding this in shard_map pass
        # check_vma=False (jax's sanctioned pallas-in-shard_map mode).
        out_shape=jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * s_rows * w_src * hp * wp,
            bytes_accessed=(3 * hc_p * wc_p + 3 * 2 * hp * wp
                            + 3 * hp * wp) * 4,
            transcendentals=0),
        interpret=interpret,
    )(sx_p, sy_p, img_p)
    return out[:, :h, :w]


def anchored_coords(sx: jnp.ndarray, sy: jnp.ndarray, ok: jnp.ndarray,
                    wc: int, hc: int, s_rows: int = 40,
                    w_src: int = 384):
    """Make real warp fields kernel-admissible: out-of-validity samples
    (whose values are masked out downstream) get their (row, 128-col
    block) valid-mean coordinate, so each kernel tile-row's source span
    is bounded by its VALID samples only.  Raw `warp_roi` fields fail
    the span check at their edges (clamped wrap-around coords inside one
    block); the valid part of the warp is smooth, so anchoring fixes
    engagement without touching any in-mask sample.

    Returns (sx', sy', admissible) with sx'/sy' clamped to the source
    range and `admissible` a traced scalar bool for `lax.cond`.  The
    kernel computes its per-tile-row window from exactly these (row,
    block) groups (plus (8,128) alignment slack), so `admissible`
    bounds its strip size by construction."""
    sx = jnp.clip(sx, 0.0, wc - 1.0)
    sy = jnp.clip(sy, 0.0, hc - 1.0)
    h, w = sx.shape
    wp = -(-w // TW) * TW
    if wp != w:
        pad = wp - w
        sx = jnp.concatenate([sx, jnp.tile(sx[:, -1:], (1, pad))], 1)
        sy = jnp.concatenate([sy, jnp.tile(sy[:, -1:], (1, pad))], 1)
        ok = jnp.concatenate([ok, jnp.zeros((h, pad), bool)], 1)
    bs = (h, wp // TW, TW)
    sxb, syb, okb = sx.reshape(bs), sy.reshape(bs), ok.reshape(bs)
    okf = okb.astype(jnp.float32)
    cnt = jnp.maximum(okf.sum(-1, keepdims=True), 1.0)
    ax = (sxb * okf).sum(-1, keepdims=True) / cnt
    ay = (syb * okf).sum(-1, keepdims=True) / cnt
    sxa = jnp.where(okb, sxb, ax).reshape(h, wp)[:, :w]
    sya = jnp.where(okb, syb, ay).reshape(h, wp)[:, :w]
    big = jnp.float32(1e9)
    dx = (jnp.where(okb, sxb, -big).max(-1)
          - jnp.where(okb, sxb, big).min(-1))
    dy = (jnp.where(okb, syb, -big).max(-1)
          - jnp.where(okb, syb, big).min(-1))
    any_ok = okb.any(-1)
    dx = jnp.where(any_ok, dx, 0.0)
    dy = jnp.where(any_ok, dy, 0.0)
    good = (jnp.all(dx <= w_src - 128 - 2 - 1)
            & jnp.all(dy <= s_rows - 8 - 2 - 1))
    return sxa, sya, good


def spans_ok_device(sx: jnp.ndarray, sy: jnp.ndarray, wc: int, hc: int,
                    s_rows: int = 40, w_src: int = 384) -> jnp.ndarray:
    """Traced (on-device) version of `tile_spans_ok`: a scalar bool the
    compose program feeds to `lax.cond` to select kernel vs gather —
    no host sync, correctness never depends on the kernel geometry."""
    sx = jnp.clip(sx, 0.0, wc - 1.0)
    sy = jnp.clip(sy, 0.0, hc - 1.0)
    h, w = sx.shape
    wp = -(-w // TW) * TW
    if wp != w:
        sx = jnp.concatenate([sx, jnp.tile(sx[:, -1:], (1, wp - w))], 1)
        sy = jnp.concatenate([sy, jnp.tile(sy[:, -1:], (1, wp - w))], 1)
    sx = sx.reshape(h, wp // TW, TW)
    sy = sy.reshape(h, wp // TW, TW)
    dx = sx.max(axis=-1) - sx.min(axis=-1)
    dy = sy.max(axis=-1) - sy.min(axis=-1)
    # The kernel floor-aligns the window origin to (8, 128); reserve
    # that alignment slack plus the +1 tap and a rounding pixel.
    return jnp.all(dx <= w_src - 128 - 2 - 1) & \
        jnp.all(dy <= s_rows - 8 - 2 - 1)


def tile_spans_ok(sx: np.ndarray, sy: np.ndarray, wc: int, hc: int,
                  s_rows: int = 40, w_src: int = 384) -> bool:
    """Host-side precondition check on the CLAMPED coordinate fields:
    every (TH, TW) tile row's source window must fit the (8, 128)-
    aligned strip (span <= s_rows-8-2 rows, w_src-128-2 cols).
    sx/sy may be coarse (subsampled) grids — the warp is smooth, so a
    stride-8 subsampling with a safety margin of 4 px is conservative."""
    sx = np.clip(sx, 0.0, wc - 1.0)
    sy = np.clip(sy, 0.0, hc - 1.0)
    h, w = sx.shape
    for j in range(0, w, TW):
        cols = slice(j, min(j + TW, w))
        dx = sx[:, cols].max(axis=1) - sx[:, cols].min(axis=1)
        dy = sy[:, cols].max(axis=1) - sy[:, cols].min(axis=1)
        if (dx + 4.0 > w_src - 128 - 2).any() or \
                (dy + 4.0 > s_rows - 8 - 2).any():
            return False
    return True
