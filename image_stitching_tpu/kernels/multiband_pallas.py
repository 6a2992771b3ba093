"""Fused multiband pyramid-accumulate as a Pallas TPU kernel.

The fused-compose scan body (`pipeline/compose_fused.py`) spends its
non-gather time on the band pyramid: per image, XLA materializes every
Gaussian level of the image AND the weight plane, every pyr_up, and every
Laplacian in HBM before the canvas accumulate reads them back — ~3x the
roofline traffic.  This kernel keeps one image's whole pyramid in VMEM:
it reads the warped rect + weight once, and the only other HBM traffic is
the read-modify-write DMA of the canvas band accumulators.

Layout: channel-LEADING planar `(3, H, W)` everywhere.  TPU arrays tile
the last two dims (sublane x lane); a channel-minor `(H, W, 3)` array
would waste 125/128 lanes and blow up VMEM ~42x.  Callers that hold
interleaved data transpose at the boundary (the fused-compose warp can
emit planar for free).

Scope (documented, checked by the wrapper): the per-image padded rect
must fit in VMEM with its pyramid and the band scratch buffers (~5.6x
the rect bytes), which holds for compose rects up to ~0.8 MP — true at
the reference's default compose_megapix=0.4 and for the canvas-sharded
gigapixel path's per-shard slices.  The XLA scan remains the fallback.

Border semantics: pyrDown/pyrUp use BORDER_REFLECT_101 edge rows/cols,
matching ops/blend.py's cv2-matched `_sep5` exactly.

Grid iterations run sequentially on a TPU core and every copy-out is
waited before the step ends, so the in-place accumulation across images
is race-free by construction.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pyramid_accumulate", "fits_vmem"]

_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _pad_r101(x, axis):
    """BORDER_REFLECT_101 pad by 2 on `axis` via explicit static slices
    (no jnp.flip — `rev` has no Mosaic lowering)."""
    sl = lambda a, b: jax.lax.slice_in_dim(x, a, b, axis=axis)
    n = x.shape[axis]
    return jnp.concatenate([sl(2, 3), sl(1, 2), x, sl(n - 2, n - 1),
                            sl(n - 3, n - 2)], axis=axis)


def _blur5(x, axis):
    """5-tap [1,4,6,4,1]/16 blur along `axis`, REFLECT_101 borders."""
    n = x.shape[axis]
    xp = _pad_r101(x, axis)
    return sum(float(_K5[i]) * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
               for i in range(5))


def _decimate(x, axis):
    """Keep even indices along `axis` (cv2 pyrDown phase)."""
    return jax.lax.slice_in_dim(x, 0, x.shape[axis], stride=2, axis=axis)


def _sep5_down(x):
    """cv2 pyrDown on (..., H, W): blur rows, decimate, blur cols, decimate."""
    hax, wax = x.ndim - 2, x.ndim - 1
    x = _decimate(_blur5(x, hax), hax)
    return _decimate(_blur5(x, wax), wax)


def _upsample2(x, axis, out_n):
    """Zero-stuff x2 along `axis` then trim to out_n."""
    z = jnp.zeros_like(x)
    st = jnp.stack([x, z], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return jax.lax.slice_in_dim(st.reshape(shape), 0, out_n, axis=axis)


def _sep5_up(x, out_h, out_w):
    """cv2 pyrUp on (..., h, w) -> (..., out_h, out_w)."""
    hax, wax = x.ndim - 2, x.ndim - 1
    x = _blur5(_upsample2(x, hax, out_h), hax)
    x = _blur5(_upsample2(x, wax, out_w), wax)
    return x * 4.0


def _kernel(offs_ref, warped_ref, weight_ref, *refs,
            n_bands: int, ph: int, pw: int):
    """Per-image: whole pyramid in VMEM; RMW-DMA the canvas band slices.

    refs = [2*(B+1) aliased input acc hbm refs (unused)]
         + [2*(B+1) OUTPUT acc hbm refs (the live buffers)]
         + [2*(B+1) VMEM scratch rects]
         + [DMA semaphore array (2*(B+1),)].
    """
    n_out = n_bands + 1
    out_refs = refs[2 * n_out:4 * n_out]
    accs, waccs = out_refs[:n_out], out_refs[n_out:]
    scratch = refs[4 * n_out:6 * n_out]
    a_scr, w_scr = scratch[:n_out], scratch[n_out:]
    sems = refs[6 * n_out]

    i = pl.program_id(0)

    def copies(b):
        oy = offs_ref[i, 1] >> b
        ox = offs_ref[i, 0] >> b
        lh, lw = ph >> b, pw >> b
        ca = pltpu.make_async_copy(
            accs[b].at[:, pl.ds(oy, lh), pl.ds(ox, lw)], a_scr[b],
            sems.at[2 * b])
        cw = pltpu.make_async_copy(
            waccs[b].at[pl.ds(oy, lh), pl.ds(ox, lw)], w_scr[b],
            sems.at[2 * b + 1])
        return ca, cw

    # Kick off every band's canvas-slice fetch up front so the DMAs
    # overlap the pyramid compute below.
    for b in range(n_out):
        ca, cw = copies(b)
        ca.start()
        cw.start()

    img = warped_ref[0]          # (3, ph, pw)
    wgt = weight_ref[0]          # (ph, pw)
    gauss = [img]
    wg = [wgt]
    for _ in range(n_bands):
        gauss.append(_sep5_down(gauss[-1]))
        wg.append(_sep5_down(wg[-1]))

    outs = []
    for b in range(n_out):
        if b < n_bands:
            g = gauss[b]
            lap = g - _sep5_up(gauss[b + 1], g.shape[-2], g.shape[-1])
        else:
            lap = gauss[b]
        ca, cw = copies(b)
        ca.wait()
        cw.wait()
        a_scr[b][...] = a_scr[b][...] + lap * wg[b][None]
        w_scr[b][...] = w_scr[b][...] + wg[b]
        oy = offs_ref[i, 1] >> b
        ox = offs_ref[i, 0] >> b
        lh, lw = ph >> b, pw >> b
        oa = pltpu.make_async_copy(
            a_scr[b], accs[b].at[:, pl.ds(oy, lh), pl.ds(ox, lw)],
            sems.at[2 * b])
        ow = pltpu.make_async_copy(
            w_scr[b], waccs[b].at[pl.ds(oy, lh), pl.ds(ox, lw)],
            sems.at[2 * b + 1])
        oa.start()
        ow.start()
        outs.append((oa, ow))

    # Every write-back must land before the next image's fetch of a
    # possibly-overlapping slice starts.
    for oa, ow in outs:
        oa.wait()
        ow.wait()


def fits_vmem(pad_h: int, pad_w: int, limit_mb: float = 10.0) -> bool:
    """Whole-rect pyramid + scratch working set vs a VMEM budget."""
    rect = pad_h * pad_w * 4 * 4            # img 3ch + weight, f32
    return rect * 5.6 < limit_mb * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("n_bands", "interpret"))
def pyramid_accumulate(warped: jnp.ndarray, weight: jnp.ndarray,
                       offs: jnp.ndarray,
                       accs: Tuple[jnp.ndarray, ...],
                       waccs: Tuple[jnp.ndarray, ...],
                       *, n_bands: int, interpret: bool = False):
    """Accumulate every image's weighted Laplacian bands into the canvas.

    warped: (N, 3, ph, pw) f32 planar; weight: (N, ph, pw) f32;
    offs: (N, 2) int32 band-0 canvas offsets (x, y), multiples of 2^B;
    accs: per-band (3, Hb, Wb) canvas accumulators; waccs: (Hb, Wb).
    All accumulators are donated (aliased) and updated in place.
    Returns (accs, waccs) updated.
    """
    n, ph, pw = warped.shape[0], warped.shape[2], warped.shape[3]
    n_out = n_bands + 1
    grid = (n,)

    in_specs = [
        pl.BlockSpec((1, 3, ph, pw), lambda i, offs_sp: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ph, pw), lambda i, offs_sp: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.ANY)] * (2 * n_out)
    out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * (2 * n_out)

    scratch_shapes = (
        [pltpu.VMEM((3, ph >> b, pw >> b), jnp.float32)
         for b in range(n_out)] +
        [pltpu.VMEM((ph >> b, pw >> b), jnp.float32)
         for b in range(n_out)] +
        [pltpu.SemaphoreType.DMA((2 * n_out,))])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    out_shapes = ([jax.ShapeDtypeStruct(a.shape, a.dtype) for a in accs] +
                  [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in waccs])
    # inputs: 0=offs(prefetch), 1=warped, 2=weight, 3..=accs+waccs
    aliases = {3 + k: k for k in range(2 * n_out)}

    outs = pl.pallas_call(
        functools.partial(_kernel, n_bands=n_bands, ph=ph, pw=pw),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offs, warped, weight, *accs, *waccs)
    return tuple(outs[:n_out]), tuple(outs[n_out:])
