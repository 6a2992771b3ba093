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

__all__ = ["FastIngest", "start_fast_ingest", "fast_prep", "pick_denom"]

_JPEG_EXTS = {".jpg", ".jpeg"}


def pick_denom(scale_needed: float) -> int:
    """Largest libjpeg DCT denom in {8,4,2,1} whose decode scale (1/d)
    still covers `scale_needed` (never upsample a decoded image)."""
    for d in (8, 4, 2):
        if 1.0 / d >= scale_needed - 1e-9:
            return d
    return 1


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


@dataclasses.dataclass
class FastIngest:
    session: "native.DecodeSession"
    n: int
    want_gray: bool        # a dedicated luma-only decode stream exists
    gray_from_rgb: bool    # derive detection gray from the RGB stack
    gray_denom: int
    rgb_denom: int
    full_sizes: List[Tuple[int, int]]  # oriented (w, h) per image
    delta: bool = False  # stacks arrive row-delta-encoded (native encode)

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

    gray_denom = pick_denom(gray_scale) if want_gray else 1
    rgb_denom = pick_denom(rgb_scale)
    # When the RGB stream already covers work scale, derive the detection
    # gray from it on device (fractional-valued like the legacy path, and
    # one decode pass instead of two).  A dedicated integer luma stream is
    # only worth it when RGB is DCT-scaled below work scale.
    gray_from_rgb = want_gray and 1.0 / rgb_denom >= gray_scale - 1e-9
    decode_gray = want_gray and not gray_from_rgb
    items = []
    for p in paths:
        if decode_gray:
            items.append((p, True, gray_denom))
        items.append((p, False, rgb_denom))
    try:
        session = native.DecodeSession(items, nthreads=nthreads,
                                       delta=_DELTA_UPLOAD)
    except OSError:
        return None
    return FastIngest(session=session, n=len(paths),
                      want_gray=decode_gray, gray_from_rgb=gray_from_rgb,
                      gray_denom=gray_denom, rgb_denom=rgb_denom,
                      full_sizes=[full] * len(paths),
                      delta=_DELTA_UPLOAD)


def _orient_stack(x: jnp.ndarray, is_portrait: bool) -> jnp.ndarray:
    """Batched orient_capture (`image_stitching.cpp:571-580`): portrait
    rotates each image 90 deg CW, landscape 180 — on device."""
    if is_portrait:
        return jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)
    return jnp.flip(x, (1, 2))


@functools.partial(jax.jit,
                   static_argnames=("is_portrait", "work_hw", "seam_hw",
                                    "gray_mode", "delta"))
def _fast_prep_impl(gray_stack, rgb_stack, *, is_portrait: bool,
                    work_hw: Tuple[int, int], seam_hw: Tuple[int, int],
                    gray_mode: str, delta: bool = False):
    from ..ops.imgproc import rgb_to_gray
    if delta:
        # Invert the upload row-delta: wrapping u8 prefix sum along W
        # (axis 2 of both (N, H, W) gray and (N, H, W, 3) rgb).
        rgb_stack = jax.lax.associative_scan(jnp.add, rgb_stack, axis=2)
        if gray_mode == "luma":
            gray_stack = jax.lax.associative_scan(jnp.add, gray_stack,
                                                  axis=2)
    rgb_o = _orient_stack(rgb_stack, is_portrait)
    seam = jax.vmap(lambda im: jnp.clip(
        jnp.round(resize(im, seam_hw)), 0, 255).astype(jnp.uint8))(rgb_o)
    gray_work = None

    def to_u8(g):
        # u8 work gray is BOTH the parity dtype (the reference's work
        # image is CV_8U: resize-u8 then cvtColor-u8) and 4x fewer bytes
        # for the detect program at ~1 GB/s effective device bandwidth.
        return jnp.clip(jnp.round(g), 0, 255).astype(jnp.uint8)

    if gray_mode == "luma":
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
    gray_mode = ("luma" if fi.want_gray
                 else "from_rgb" if fi.gray_from_rgb else "none")
    return _fast_prep_impl(
        gray_stack if gray_stack is not None else jnp.zeros((1, 1, 1)),
        rgb_stack, is_portrait=is_portrait, work_hw=work_hw,
        seam_hw=seam_hw, gray_mode=gray_mode, delta=fi.delta)
