"""Pallas TPU kernel: streamed per-keypoint ORB sampling for level planes
too large for VMEM residency.

`orb_sample_pallas` keeps the whole raw+blurred level planes VMEM-resident
(11 MB budget -> ~1.4 MP total), which silently excludes level 0 of the
reference-default full-res work images (`work_megapix=-1`,
`image_stitching.cpp:53`): an 8 MP plane is 32 MB/f32.  This variant keeps
the planes in HBM (`memory_space=pltpu.ANY`) and DMAs one
(WIN_H, WIN_W)-aligned window per keypoint into VMEM scratch:

  * per grid step, ALL `BK` window DMAs start back-to-back (both planes
    ride one strided copy from a (2, hp, wp) stack), then each keypoint
    waits only its own semaphore — later windows stream in while earlier
    keypoints compute, so DMA latency hides behind the MXU one-hot
    matmuls;
  * per-keypoint DMA traffic is 2 * WIN_H * WIN_W * 4 B (~115 KB at the
    default span): K=4000 keypoints move ~460 MB, < 1 ms of HBM bandwidth
    on v5e — versus re-reading a 32 MB plane per XLA gather pass;
  * the in-window compute is IDENTICAL to `orb_sample_pallas._kernel`
    (IC-angle disk moments as masked VPU reductions, rBRIEF samples as
    one-hot MXU matmuls), so samples are bit-identical to the resident
    kernel wherever both are admissible (pinned by
    tests/test_orb_stream_pallas.py).

Window coverage/alignment proof is the resident kernel's: x0 =
clip(floor128(cx - span), 0, wp - WIN_W) keeps every clipped sample in
[x0, x0 + WIN_W) with x0 a lane multiple (rows likewise with 8-alignment),
so the DMA'd window contains exactly the pixels the resident kernel would
have sliced from the full plane.

Reference hot path: cv::ORB::detectAndCompute at
`image_stitching.cpp:545,:613`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .orb_sample_pallas import AUX_W, BK, N_SAMPLES, win_shape

__all__ = ["orb_sample_stream_pallas", "plane_stream_admissible"]

# HBM-resident planes: admit anything the pad arithmetic itself can hold.
# The VMEM footprint is the per-block scratch (BK windows), not the plane;
# this cap only guards absurd inputs (the padded f32 plane pair in HBM).
PLANE_STREAM_BUDGET_BYTES = int(1.1e9)


def plane_stream_admissible(h: int, w: int) -> bool:
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    return 2 * hp * wp * 4 <= PLANE_STREAM_BUDGET_BYTES


def _kernel(cyx_ref, xyf_ref, pat_ref, planes_hbm, samp_ref, aux_ref,
            win_scratch, sems, *, h: int, w: int, hp: int, wp: int,
            radius: int, span: int):
    win_h, win_w = win_shape(span)
    px = pat_ref[0, :]
    py = pat_ref[1, :]
    rr = jnp.float32(radius * radius)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, AUX_W), 1)[0]

    def window_origin(r):
        cy = cyx_ref[r, 0]
        cx = cyx_ref[r, 1]
        y0 = jnp.clip((cy - span) // 8 * 8, 0, hp - win_h)
        x0 = jnp.clip((cx - span) // 128 * 128, 0, wp - win_w)
        return (pl.multiple_of(y0, 8), pl.multiple_of(x0, 128), cy, cx)

    # Start ALL window DMAs first (one strided copy moves both planes);
    # keypoint r then only waits its own semaphore, so windows r+1..BK-1
    # keep streaming while keypoint r computes.
    for r in range(BK):
        y0, x0, _, _ = window_origin(r)
        pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(y0, win_h), pl.ds(x0, win_w)],
            win_scratch.at[r], sems.at[r]).start()

    for r in range(BK):
        y0, x0, cy, cx = window_origin(r)
        pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(y0, win_h), pl.ds(x0, win_w)],
            win_scratch.at[r], sems.at[r]).wait()
        wraw = win_scratch[r, 0]
        wblur = win_scratch[r, 1]
        # ---- identical in-window math to orb_sample_pallas._kernel ----
        ys = jax.lax.broadcasted_iota(jnp.int32, (win_h, win_w), 0) + y0
        xs = jax.lax.broadcasted_iota(jnp.int32, (win_h, win_w), 1) + x0
        dyw = (ys - cy).astype(jnp.float32)
        dxw = (xs - cx).astype(jnp.float32)
        disk = jnp.where(dxw * dxw + dyw * dyw <= rr, 1.0, 0.0)
        m10 = jnp.sum(wraw * (dxw * disk))
        m01 = jnp.sum(wraw * (dyw * disk))
        aux = (jnp.where(lane == 0, m10, 0.0)
               + jnp.where(lane == 1, m01, 0.0))
        aux_ref[r, :] = aux
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
        lx = gx - x0
        ly = gy - y0
        ri = jax.lax.broadcasted_iota(jnp.int32, (N_SAMPLES, win_h), 1)
        oh_row = jnp.where(ri == ly[:, None], 1.0, 0.0)
        vals = jnp.dot(oh_row, wblur,
                       preferred_element_type=jnp.float32)
        ci = jax.lax.broadcasted_iota(jnp.int32, (N_SAMPLES, win_w), 1)
        oh_col = jnp.where(ci == lx[:, None], 1.0, 0.0)
        samp_ref[r, :] = jnp.sum(vals * oh_col, axis=1)


@functools.lru_cache(maxsize=None)
def _stream_fn(radius: int, span: int, interpret: bool):
    """Per-static-config kernel entry, wrapped in sequential_vmap: the
    Mosaic lowering supports ANY-space inputs only as whole arrays with
    a trivial index map, so the automatic pallas_call batching rule
    cannot vmap this kernel (observed on the e2e detect stack, whose
    level-0 planes take the stream path under `jax.vmap`).
    sequential_vmap turns an enclosing vmap into a lax.map over
    unbatched kernel calls — same device work (the grid is sequential on
    a TensorCore anyway)."""

    @jax.custom_batching.sequential_vmap
    def fn(img_raw, img_blur, xy, pattern_xy):
        return _stream_impl(img_raw, img_blur, xy, pattern_xy,
                            radius=radius, span=span, interpret=interpret)
    return fn


@functools.partial(jax.jit, static_argnames=("radius", "span", "interpret"))
def orb_sample_stream_pallas(img_raw: jnp.ndarray, img_blur: jnp.ndarray,
                             xy: jnp.ndarray, pattern_xy: jnp.ndarray, *,
                             radius: int, span: int,
                             interpret: bool = False):
    """Streamed fused IC-angle moments + rBRIEF samples for one level.

    Same contract as `orb_sample_pallas.orb_sample_pallas` (samples
    (K, 512) f32, angle (K,), moments (K, 2)); admissible for planes far
    beyond the VMEM-resident kernel's budget (see
    `plane_stream_admissible`).  Safe under `jax.vmap` (sequential map,
    see `_stream_fn`).
    """
    return _stream_fn(radius, span, bool(interpret))(
        img_raw, img_blur, xy, pattern_xy)


def _stream_impl(img_raw: jnp.ndarray, img_blur: jnp.ndarray,
                 xy: jnp.ndarray, pattern_xy: jnp.ndarray, *,
                 radius: int, span: int, interpret: bool = False):
    h, w = img_raw.shape
    win_h, win_w = win_shape(span)
    hp = max(-(-h // 8) * 8, win_h)
    wp = max(-(-w // 128) * 128, win_w)
    planes = jnp.stack([
        jnp.pad(img_raw.astype(jnp.float32), ((0, hp - h), (0, wp - w))),
        jnp.pad(img_blur.astype(jnp.float32), ((0, hp - h), (0, wp - w))),
    ])
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
            pl.BlockSpec(memory_space=pl.ANY),      # planes stay in HBM
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
        scratch_shapes=[
            pltpu.VMEM((BK, 2, win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((BK,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * kp * N_SAMPLES * win_h * win_w,
            bytes_accessed=(kp * 2 * win_h * win_w
                            + kp * (N_SAMPLES + 4)) * 4,
            transcendentals=3 * kp),
        interpret=interpret,
    )(cyx, xy_p, pattern_xy.astype(jnp.float32), planes)
    moments = aux[:k, :2]
    angle = jnp.arctan2(moments[:, 1], moments[:, 0])
    return samples[:k], angle, moments
