"""Pallas TPU kernel: fused per-keypoint ORB sampling (IC-angle moments +
rBRIEF descriptor samples) with zero HBM gathers.

ORB detect at default K=4000 is ~93% per-keypoint patch gathers
(tools/exp_orb_k_scaling.py: orientation 12.6 ms + describe 27.4 ms of
42.7 ms/VGA image); the best XLA spelling (vmapped `dynamic_slice`)
is slice-count-bound at ~2.6 us per patch and a flat element gather is
11x worse (tools/exp_patch_gather.py).  This kernel removes the gathers
the same way `warp_gather_pallas` removed the compose-path remap gather
(reference hot path: cv::ORB::detectAndCompute at
`image_stitching.cpp:545,:613`):

  * the whole LEVEL image (raw + blurred planes) stays VMEM-resident —
    detect levels are small (level 0 of a 1.2 MP rig tile: 4.9 MB f32);
  * per keypoint, an (8, 128)-aligned (WIN_H, WIN_W) window is sliced
    from the resident plane (VMEM->register, no DMA descriptors);
  * IC-angle disk moments are masked VPU reductions over the window
    with iota-generated (dx, dy, disk) weights — nothing materializes
    in HBM;
  * the 512 rotated rBRIEF sample reads become ONE (512, WIN_H) @
    (WIN_H, WIN_W) MXU matmul against an iota-generated row one-hot,
    followed by a column one-hot mask + row-sum.  f32 one-hot matmuls
    select exactly (each output is 1.0 * value + zeros), so samples are
    bit-identical to the take_along_axis path.

Window coverage proof (span = max sample reach from the rounded center,
statically derived from the pattern): x0 = clip(floor128(cx - span), 0,
wp - WIN_W) gives gx - x0 <= span + span + 127 < WIN_W and gx >= x0 for
globally-clipped samples; rows likewise with 8-alignment (+7).  Samples
are clipped to the UNPADDED image box [0, w-1] x [0, h-1] first —
identical to `_describe_impl`'s global clamp — so zero-padding never
leaks into a valid read.

Orientation parity: valid keypoints sit >= border (patch/2 + 2) from
the image edge, so the radius-(patch/2) disk is fully interior and the
moments equal `_orientations`' edge-padded form exactly.  Invalid
(masked) slots at xy=0 may differ — their angle/descriptor is never
consumed (Features.valid gates them everywhere downstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["orb_sample_pallas", "win_shape", "plane_admissible"]

BK = 8          # keypoints per grid step (unrolled in-kernel)
N_SAMPLES = 512  # rBRIEF endpoints: 256 pairs x 2
AUX_W = 128      # lane-width row per keypoint: [angle, m10, m01, 0...]

# VMEM budget for the two resident planes (f32).  v5e VMEM is ~16 MB;
# leave room for the per-keypoint (512, WIN_W) temporaries and double
# buffering of the tiny scalar blocks.
PLANE_BUDGET_BYTES = int(11e6)


def win_shape(span: int) -> tuple:
    """Static window size covering every clipped sample.

    Rows: floor8(cy - span) start -> reach span + span + 7; cols:
    floor128 -> + 127.  Rounded up to the (8, 128) tile grid."""
    wh = -(-(2 * span + 8) // 8) * 8
    ww = -(-(2 * span + 128) // 128) * 128
    return wh, ww


def plane_admissible(h: int, w: int) -> bool:
    """True when raw + blurred f32 planes fit the VMEM budget."""
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    return 2 * hp * wp * 4 <= PLANE_BUDGET_BYTES


def _kernel(cyx_ref, xyf_ref, pat_ref, raw_ref, blur_ref,
            samp_ref, aux_ref, *, h: int, w: int, hp: int, wp: int,
            radius: int, span: int):
    win_h, win_w = win_shape(span)
    px = pat_ref[0, :]                                     # (512,)
    py = pat_ref[1, :]
    rr = jnp.float32(radius * radius)
    # (1-D iota does not lower on Mosaic; squeeze a 2-D one.)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, AUX_W), 1)[0]
    for r in range(BK):
        cy = cyx_ref[r, 0]
        cx = cyx_ref[r, 1]
        y0 = jnp.clip((cy - span) // 8 * 8, 0, hp - win_h)
        x0 = jnp.clip((cx - span) // 128 * 128, 0, wp - win_w)
        y0 = pl.multiple_of(y0, 8)
        x0 = pl.multiple_of(x0, 128)
        # IC-angle disk moments on the RAW plane: iota-generated weights,
        # two masked reductions.  (matches ops.features.orb._orientations
        # for every in-border keypoint; see module docstring)
        ys = jax.lax.broadcasted_iota(jnp.int32, (win_h, win_w), 0) + y0
        xs = jax.lax.broadcasted_iota(jnp.int32, (win_h, win_w), 1) + x0
        dyw = (ys - cy).astype(jnp.float32)
        dxw = (xs - cx).astype(jnp.float32)
        disk = jnp.where(dxw * dxw + dyw * dyw <= rr, 1.0, 0.0)
        wraw = raw_ref[pl.ds(y0, win_h), pl.ds(x0, win_w)]
        m10 = jnp.sum(wraw * (dxw * disk))
        m01 = jnp.sum(wraw * (dyw * disk))
        # Mosaic cannot store scalars to VMEM: pack (m10, m01) into one
        # masked 128-lane row instead (the caller computes arctan2 —
        # unimplemented in Mosaic).
        aux = (jnp.where(lane == 0, m10, 0.0)
               + jnp.where(lane == 1, m01, 0.0))
        aux_ref[r, :] = aux
        # Rotated rBRIEF sample coordinates (global, clipped to the
        # UNPADDED image box — _describe_impl's clamp semantics).
        # cos/sin of the IC angle via the quotient form (no atan2 in
        # Mosaic): ca = m10/|m|, sa = m01/|m| — mathematically equal to
        # cos/sin(arctan2), off by ulps from the XLA path; a sample
        # lands differently only when a rotated coordinate sits exactly
        # on a .5 rounding boundary.
        nrm = jnp.sqrt(m10 * m10 + m01 * m01)
        safe = jnp.maximum(nrm, jnp.float32(1e-30))
        ca = jnp.where(nrm > 0.0, m10 / safe, 1.0)
        sa = jnp.where(nrm > 0.0, m01 / safe, 0.0)
        xf = xyf_ref[r, 0]
        yf = xyf_ref[r, 1]
        gx = jnp.clip(jnp.round(xf + ca * px - sa * py).astype(jnp.int32),
                      0, w - 1)
        gy = jnp.clip(jnp.round(yf + sa * px + ca * py).astype(jnp.int32),
                      0, h - 1)
        lx = gx - x0                                       # (512,) in [0, win_w)
        ly = gy - y0
        # Row select on the MXU (one-hot is iota-generated; f32 matmul of
        # a {0,1} matrix is an exact select), then column one-hot + sum.
        wblur = blur_ref[pl.ds(y0, win_h), pl.ds(x0, win_w)]
        ri = jax.lax.broadcasted_iota(jnp.int32, (N_SAMPLES, win_h), 1)
        oh_row = jnp.where(ri == ly[:, None], 1.0, 0.0)
        vals = jnp.dot(oh_row, wblur,
                       preferred_element_type=jnp.float32)  # (512, win_w)
        ci = jax.lax.broadcasted_iota(jnp.int32, (N_SAMPLES, win_w), 1)
        oh_col = jnp.where(ci == lx[:, None], 1.0, 0.0)
        samp_ref[r, :] = jnp.sum(vals * oh_col, axis=1)


@functools.partial(jax.jit, static_argnames=("radius", "span", "interpret"))
def orb_sample_pallas(img_raw: jnp.ndarray, img_blur: jnp.ndarray,
                      xy: jnp.ndarray, pattern_xy: jnp.ndarray, *,
                      radius: int, span: int,
                      interpret: bool = False):
    """Fused IC-angle moments + rBRIEF samples for one level image.

    img_raw / img_blur: (h, w) f32 — the level image and its sigma-2
    blur.  xy: (K, 2) f32 subpixel keypoints (x, y).  pattern_xy:
    (2, 512) f32 — the 256 (p1, p2) endpoint offsets, p1 in [:, :256],
    p2 in [:, 256:].  radius: IC-angle disk radius (patch // 2).
    span: static max sample reach (>= radius and >= pattern span).

    Returns (samples (K, 512) f32, angle (K,) f32, moments (K, 2) f32
    [m10, m01]).  Descriptor bits are `samples[:, :256] <
    samples[:, 256:]`.  The kernel rotates with the quotient form
    (m10/|m|, m01/|m|); `angle` is the equivalent XLA arctan2 of the
    same moments (may differ by ulps from the rotation actually used).
    """
    h, w = img_raw.shape
    win_h, win_w = win_shape(span)
    hp = max(-(-h // 8) * 8, win_h)
    wp = max(-(-w // 128) * 128, win_w)
    raw_p = jnp.pad(img_raw.astype(jnp.float32),
                    ((0, hp - h), (0, wp - w)))
    blur_p = jnp.pad(img_blur.astype(jnp.float32),
                     ((0, hp - h), (0, wp - w)))
    k = xy.shape[0]
    kp = -(-k // BK) * BK
    xy_p = jnp.pad(xy.astype(jnp.float32), ((0, kp - k), (0, 0)))
    cyx = jnp.stack(
        [jnp.clip(jnp.round(xy_p[:, 1]).astype(jnp.int32), 0, h - 1),
         jnp.clip(jnp.round(xy_p[:, 0]).astype(jnp.int32), 0, w - 1)], -1)

    grid = (kp // BK,)
    samples, aux = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, hp=hp, wp=wp,
                          radius=radius, span=span),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BK, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, N_SAMPLES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BK, N_SAMPLES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, AUX_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp, N_SAMPLES), jnp.float32),
            jax.ShapeDtypeStruct((kp, AUX_W), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * kp * N_SAMPLES * win_h * win_w,
            bytes_accessed=(2 * hp * wp + kp * (N_SAMPLES + 4)) * 4,
            transcendentals=3 * kp),
        interpret=interpret,
    )(cyx, xy_p, pattern_xy.astype(jnp.float32), raw_p, blur_p)
    moments = aux[:k, :2]
    angle = jnp.arctan2(moments[:, 1], moments[:, 0])
    return samples[:k], angle, moments
