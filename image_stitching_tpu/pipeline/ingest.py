"""Fast ingestion: probe -> decode plan -> async native decode -> uploads.

The reference decodes every image to full RGB on the host
(`/root/reference/image_stitching/image_stitching.cpp:567-580`, again at
`:1091-1103`) even though its three-scale scheme (`:53-55`) only ever
consumes (a) a work-scale grayscale for detection, (b) a seam-scale RGB,
and (c) a compose-scale RGB.  On the tunnel-attached TPU the decode +
upload of full RGB dominated round-1 wall time (60%), so this module
decodes exactly what each stage needs:

  * grayscale luma-only JPEG decode for the detect path (skips chroma
    upsampling + RGB conversion; JPEG Y is the same BT.601 luma as
    cv2 COLOR_BGR2GRAY, so detection semantics are preserved);
  * DCT-scaled (1/2, 1/4, 1/8) RGB decode when seam/compose megapix caps
    resolution — the IDCT itself runs at the reduced scale;
  * decode on background C++ threads (GIL released) while the Python
    thread queues device uploads — uploads are IO-bound tunnel waits, so
    decode of image i+1 overlaps the transfer of image i on one core.

Orientation (`:571-580`) happens on DEVICE in the prep program, not as a
host rot90/rot180 memcpy.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import native
from ..ops.imgproc import resize, scale_size

__all__ = ["FastIngest", "start_fast_ingest", "fast_prep", "pick_num8"]

_JPEG_EXTS = {".jpg", ".jpeg"}


def pick_num8(scale_needed: float) -> int:
    """Smallest libjpeg-turbo DCT numerator num8 in 1..8 whose decode
    scale (num8/8) still covers `scale_needed` (never upsample a decoded
    image).  Any eighth is valid, not just powers of two."""
    import math
    return max(1, min(8, math.ceil(8.0 * scale_needed - 1e-9)))


# Row-delta-encode uploads (exact mod-256 roundtrip; native delta_rows
# encode on the decode threads, wrapping u8 prefix-sum inversion on
# device).  Default OFF after two measured NEGATIVE results on the axon
# tunnel: (a) a numpy encode on the Python upload thread competed with
# the decode threads for the single core (Reading 1.38 -> 2.12 s); (b)
# even encoded for free on the native decode threads, the delta of real
# captures uploads SLOWER than raw (Reading 1.16 -> 2.09 s, e2e 15-17
# -> 12.8 MP/s): decoded JPEGs keep their sensor noise, so the
# horizontal gradient is noise-dominated and the tunnel LZ compresses
# it worse than the raw pixels' smooth runs.  The synthetic probe that
# motivated it (tools/exp_upload_compress.py: row-delta 53.4 vs natural
# 39.5 MB/s) was smoother than real content.  Opt in with
# STITCH_DELTA_UPLOAD=1 for low-noise sources.
_DELTA_UPLOAD = os.environ.get("STITCH_DELTA_UPLOAD", "") not in ("", "0")


def _row_delta(x: np.ndarray) -> np.ndarray:
    """Wrapping horizontal difference along W (axis 1 of (H, W[, C])).

    Reference implementation of the native delta_rows encode — used by
    tests to validate the device-side inversion."""
    d = x.copy()
    d[:, 1:] = d[:, 1:] - x[:, :-1]  # uint8 wraps mod 256
    return d


def _fancy_upsample2x(c: jnp.ndarray) -> jnp.ndarray:
    """libjpeg h2v2 fancy (triangle) chroma upsample, bit-exact.

    c: (H, W) int32 chroma plane (the VALID ceil(h/2) x ceil(w/2) crop).
    Returns (2H, 2W) int32.  Per jdsample.c h2v2_fancy_upsample: vertical
    blend colsum = 3*near + far (edge rows duplicated), then horizontal
    (3*this + other + {8 even, 7 odd}) >> 4 with edge clamping — the
    first/last-column special cases (4*s + 8|7) >> 4 fall out of the
    clamping since 3*s + s = 4*s."""
    up = jnp.concatenate([c[:1], c[:-1]], axis=0)
    dn = jnp.concatenate([c[1:], c[-1:]], axis=0)
    rows_even = 3 * c + up
    rows_odd = 3 * c + dn
    v = jnp.stack([rows_even, rows_odd], axis=1).reshape(
        c.shape[0] * 2, c.shape[1])
    lf = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
    rt = jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)
    cols_even = (3 * v + lf + 8) >> 4
    cols_odd = (3 * v + rt + 7) >> 4
    return jnp.stack([cols_even, cols_odd], axis=2).reshape(
        v.shape[0], c.shape[1] * 2)


def yuv420_to_rgb_exact(y: jnp.ndarray, cb: jnp.ndarray,
                        cr: jnp.ndarray) -> jnp.ndarray:
    """JPEG 4:2:0 planes -> RGB u8, bit-exact vs libjpeg's own pipeline
    (fancy upsample + jdcolor.c fixed-point YCbCr->RGB, SCALEBITS=16).

    y: (H, W) u8; cb/cr: (ceil(H/2), ceil(W/2)) u8.  Returns (H, W, 3) u8.
    """
    h, w = y.shape
    # _fancy_upsample2x folds its 4-bit scale back out (>> 4), so chroma
    # is plain 0..255 here; jdcolor.c tables use FIX(x) = round(x * 2^16)
    # on (chroma - 128).
    cbf = _fancy_upsample2x(cb.astype(jnp.int32))[:h, :w] - 128
    crf = _fancy_upsample2x(cr.astype(jnp.int32))[:h, :w] - 128
    yi = y.astype(jnp.int32)
    r = yi + ((91881 * crf + 32768) >> 16)
    b = yi + ((116130 * cbf + 32768) >> 16)
    g = yi + ((-22554 * cbf - 46802 * crf + 32768) >> 16)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


@dataclasses.dataclass
class FastIngest:
    session: "native.DecodeSession"
    n: int
    want_gray: bool        # a dedicated luma-only decode stream exists
    gray_from_rgb: bool    # derive detection gray from the RGB stack
    gray_num8: int
    rgb_num8: int
    full_sizes: List[Tuple[int, int]]  # oriented (w, h) per image
    delta: bool = False  # stacks arrive row-delta-encoded (native encode)
    raw_yuv: bool = False  # stacks are packed 4:2:0 planes (flat u8)
    decode_hw: Tuple[int, int] = (0, 0)  # unoriented (h, w) at decode
    raw_num8: int = 8      # DCT scale of the raw 4:2:0 decode
    # Packed-plane layout of the raw decode: (ya_h, ya_w, h_d, w_d) —
    # iMCU-aligned Y strides + valid (scaled) dims; chroma = halves.
    raw_layout: Tuple[int, int, int, int] = (0, 0, 0, 0)

    def upload(self):
        """Wait for decodes in order and queue device uploads back-to-back
        (all uploads first, dispatch later: uploads serialize with device
        compute through the tunnel).  Returns (gray_stack | None,
        rgb_stack) as device arrays at DECODE scale, unoriented — row-
        delta-encoded by the native decode threads when self.delta
        (fast_prep inverts on device)."""
        grays, rgbs = [], []
        item = 0
        for _ in range(self.n):
            if self.want_gray:
                grays.append(jax.device_put(self.session.wait(item)))
                item += 1
            rgbs.append(jax.device_put(self.session.wait(item)))
            item += 1
        self.session.finish()
        gray_stack = jnp.stack(grays) if grays else None
        rgb_stack = jnp.stack(rgbs)
        return gray_stack, rgb_stack


def start_fast_ingest(paths: Sequence[str], is_portrait: bool,
                      want_gray: bool, gray_scale: float,
                      rgb_scale: float,
                      nthreads: int = 2) -> Optional[FastIngest]:
    """Begin background decode of a uniform all-JPEG capture set.

    Returns None when preconditions fail (no native runtime, non-JPEG
    files, non-uniform sizes) — caller falls back to the legacy loop.
    gray_scale/rgb_scale: the smallest scale each representation must
    support (work scale; max(seam, compose) scale).
    """
    if not native.available():
        return None
    sizes = []
    for p in paths:
        if os.path.splitext(p)[1].lower() not in _JPEG_EXTS:
            return None
        wh = native.probe_image(p)
        if wh is None:
            return None
        sizes.append(wh)
    if len(set(sizes)) != 1:
        return None
    w_dec, h_dec = sizes[0]
    full = (h_dec, w_dec) if is_portrait else (w_dec, h_dec)

    gray_num8 = pick_num8(gray_scale) if want_gray else 8
    rgb_num8 = pick_num8(rgb_scale)
    # Raw 4:2:0 plane decode (STITCH_RAW_YUV=0 to disable): when every
    # file is an h2v2 YCbCr JPEG, ship the codec's own Y/Cb/Cr planes at
    # the largest needed scale — 1.5 bytes/px on the tunnel instead of 3
    # — and run libjpeg's fancy upsample + fixed-point color convert on
    # device (yuv420_to_rgb_exact; bit-exact at full scale, box-resampled
    # chroma at reduced scales).  The Y plane IS the detection luma, so
    # ONE entropy pass per file serves both streams (the two-stream
    # decode paid the full Huffman decode twice per file — measured
    # 696 -> 410 ms for 8x8MP at num8=4, tools/profile_ingest history).
    use_raw = (not _DELTA_UPLOAD and
               os.environ.get("STITCH_RAW_YUV", "1") != "0")
    if use_raw:
        for p in paths:
            probe = native.probe_jpeg_sampling(p)
            if probe is None or not probe[2]:
                use_raw = False
                break
    if use_raw:
        raw_num8 = max(gray_num8 if want_gray else 1, rgb_num8)
        if raw_num8 % 2 == 1 and raw_num8 < 8:
            raw_num8 += 1   # even scaled IDCTs are libjpeg's SIMD paths
        items = [(p, False, raw_num8, True) for p in paths]
        try:
            session = native.DecodeSession(items, nthreads=nthreads)
        except OSError:
            return None
        ya_w, ya_h, _, _ = native.yuv420_layout(w_dec, h_dec, raw_num8)
        wd, hd = native.scaled_dims(w_dec, h_dec, raw_num8)
        return FastIngest(session=session, n=len(paths), want_gray=False,
                          gray_from_rgb=want_gray, gray_num8=raw_num8,
                          rgb_num8=raw_num8, full_sizes=[full] * len(paths),
                          raw_yuv=True, decode_hw=(hd, wd),
                          raw_num8=raw_num8,
                          raw_layout=(ya_h, ya_w, hd, wd))
    # When the RGB stream already covers work scale, derive the detection
    # gray from it on device (fractional-valued like the legacy path, and
    # one decode pass instead of two).  A dedicated integer luma stream is
    # only worth it when RGB is DCT-scaled below work scale.
    gray_from_rgb = want_gray and rgb_num8 / 8.0 >= gray_scale - 1e-9
    decode_gray = want_gray and not gray_from_rgb
    items = []
    for p in paths:
        if decode_gray:
            items.append((p, True, gray_num8))
        items.append((p, False, rgb_num8))
    try:
        session = native.DecodeSession(items, nthreads=nthreads,
                                       delta=_DELTA_UPLOAD)
    except OSError:
        return None
    return FastIngest(session=session, n=len(paths),
                      want_gray=decode_gray, gray_from_rgb=gray_from_rgb,
                      gray_num8=gray_num8, rgb_num8=rgb_num8,
                      full_sizes=[full] * len(paths),
                      delta=_DELTA_UPLOAD, decode_hw=(h_dec, w_dec))


def _orient_stack(x: jnp.ndarray, is_portrait: bool) -> jnp.ndarray:
    """Batched orient_capture (`image_stitching.cpp:571-580`): portrait
    rotates each image 90 deg CW, landscape 180 — on device."""
    if is_portrait:
        return jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)
    return jnp.flip(x, (1, 2))


@functools.partial(jax.jit,
                   static_argnames=("is_portrait", "work_hw", "seam_hw",
                                    "gray_mode", "delta", "raw_hw"))
def _fast_prep_impl(gray_stack, rgb_stack, *, is_portrait: bool,
                    work_hw: Tuple[int, int], seam_hw: Tuple[int, int],
                    gray_mode: str, delta: bool = False,
                    raw_hw: Optional[Tuple[int, int, int, int]] = None):
    from ..ops.imgproc import rgb_to_gray
    if delta:
        # Invert the upload row-delta: wrapping u8 prefix sum along W
        # (axis 2 of both (N, H, W) gray and (N, H, W, 3) rgb).
        rgb_stack = jax.lax.associative_scan(jnp.add, rgb_stack, axis=2)
        if gray_mode == "luma":
            gray_stack = jax.lax.associative_scan(jnp.add, gray_stack,
                                                  axis=2)
    y_planes = None
    if raw_hw is not None:
        # rgb_stack is (N, L) packed 4:2:0 planes at iMCU-aligned strides
        # (core/native.py yuv420_layout); unpack, crop to valid dims, and
        # run libjpeg's upsample+convert on device (bit-exact at full
        # scale; box-resampled chroma at DCT-reduced scales).
        # raw_hw = (ya_h, ya_w, h_d, w_d): aligned Y strides + valid dims.
        ya_h, ya_w, h_d, w_d = raw_hw
        n_img = rgb_stack.shape[0]
        ca_w, ca_h = ya_w // 2, ya_h // 2
        ch_d, cw_d = (h_d + 1) // 2, (w_d + 1) // 2
        y_sz, c_sz = ya_w * ya_h, ca_w * ca_h
        y_planes = rgb_stack[:, :y_sz].reshape(
            n_img, ya_h, ya_w)[:, :h_d, :w_d]
        cb = rgb_stack[:, y_sz:y_sz + c_sz].reshape(
            n_img, ca_h, ca_w)[:, :ch_d, :cw_d]
        cr = rgb_stack[:, y_sz + c_sz:].reshape(
            n_img, ca_h, ca_w)[:, :ch_d, :cw_d]
        rgb_stack = jax.vmap(yuv420_to_rgb_exact)(y_planes, cb, cr)
    rgb_o = _orient_stack(rgb_stack, is_portrait)
    seam = jax.vmap(lambda im: jnp.clip(
        jnp.round(resize(im, seam_hw)), 0, 255).astype(jnp.uint8))(rgb_o)
    gray_work = None

    def to_u8(g):
        # u8 work gray is BOTH the parity dtype (the reference's work
        # image is CV_8U: resize-u8 then cvtColor-u8) and 4x fewer bytes
        # for the detect program at ~1 GB/s effective device bandwidth.
        return jnp.clip(jnp.round(g), 0, 255).astype(jnp.uint8)

    if gray_mode == "yuv":
        # The codec Y plane IS the BT.601 luma the dedicated gray decode
        # stream would produce — zero extra bytes, exact 'luma' parity.
        g_o = _orient_stack(y_planes, is_portrait)
        if g_o.shape[1:3] == tuple(work_hw):
            gray_work = g_o
        else:
            gray_work = jax.vmap(
                lambda g: to_u8(resize(g, work_hw)))(g_o)
    elif gray_mode == "luma":
        g_o = _orient_stack(gray_stack, is_portrait)
        if g_o.shape[1:3] == tuple(work_hw):
            gray_work = g_o if g_o.dtype == jnp.uint8 else jax.vmap(to_u8)(
                g_o)
        else:
            gray_work = jax.vmap(
                lambda g: to_u8(resize(g, work_hw)))(g_o)
    elif gray_mode == "from_rgb":
        gray_work = jax.vmap(
            lambda im: to_u8(rgb_to_gray(resize(im, work_hw))))(rgb_o)
    return gray_work, rgb_o, seam


def fast_prep(fi: FastIngest, gray_stack, rgb_stack, is_portrait: bool,
              work_hw: Tuple[int, int], seam_hw: Tuple[int, int]):
    """Orient + resize the decoded stacks in one device program.

    Returns (gray_work (N, Hw, Ww) float32 | None,
             rgb_oriented (N, Hs, Ws, 3) uint8 at decode scale,
             seam (N, sh, sw, 3) uint8).
    """
    if fi.raw_yuv:
        gray_mode = "yuv" if fi.gray_from_rgb else "none"
    else:
        gray_mode = ("luma" if fi.want_gray
                     else "from_rgb" if fi.gray_from_rgb else "none")
    return _fast_prep_impl(
        gray_stack if gray_stack is not None else jnp.zeros((1, 1, 1)),
        rgb_stack, is_portrait=is_portrait, work_hw=work_hw,
        seam_hw=seam_hw, gray_mode=gray_mode, delta=fi.delta,
        raw_hw=fi.raw_layout if fi.raw_yuv else None)
