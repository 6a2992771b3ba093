"""ctypes binding to the C++ host runtime (native/libstitch_runtime.so).

Provides accelerated host-side primitives — threaded JPEG/PNG decode, EXIF
ImageDescription extraction, union-find components, exact EDT, DP seam —
with transparent fallback to the pure-Python implementations when the
shared library has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["lib", "available", "read_image", "read_images",
           "read_image_opts", "DecodeSession", "scaled_dims",
           "exif_description", "biggest_component", "edt_sq", "dp_seam",
           "write_jpeg"]

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libstitch_runtime.so"),
    os.path.join(os.path.dirname(__file__), "libstitch_runtime.so"),
]

def _try_autobuild() -> None:
    """Build the shared library on first import when it is absent.

    The .so is gitignored, so a fresh checkout (or rebuilt container)
    would otherwise silently fall back to the pure-Python paths — round-3
    benches lost 3x ingest throughput to exactly that.  Best-effort: any
    failure leaves the fallback behavior unchanged.  STITCH_NO_AUTOBUILD=1
    disables (e.g. for tests of the pure-Python fallbacks)."""
    if os.environ.get("STITCH_NO_AUTOBUILD"):
        return
    src_dir = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                           "..", "..", "native"))
    if not os.path.exists(os.path.join(src_dir, "Makefile")):
        return
    import subprocess
    import sys
    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True, timeout=300)
    except Exception as e:  # attributable fallback, not a silent one
        detail = ""
        if isinstance(e, subprocess.CalledProcessError) and e.stderr:
            detail = ": " + e.stderr.decode(errors="replace").strip(
                ).splitlines()[-1][:200]
        print(f"image_stitching_tpu: native runtime autobuild failed "
              f"({type(e).__name__}{detail}); using pure-Python host "
              f"fallbacks (~3x slower ingest). Build with `make -C "
              f"{src_dir}`.", file=sys.stderr)


lib = None
for _attempt in range(2):
    for _p in _LIB_PATHS:
        _p = os.path.abspath(_p)
        if os.path.exists(_p):
            try:
                lib = ctypes.CDLL(_p)
                break
            except OSError:
                lib = None
    if lib is not None or _attempt == 1:
        break
    _try_autobuild()

if lib is not None:
    c_char_p = ctypes.c_char_p
    c_int = ctypes.c_int
    c_double = ctypes.c_double
    u8_p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32_p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64_p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32_p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.sr_probe_image.argtypes = [c_char_p, ctypes.POINTER(c_int),
                                   ctypes.POINTER(c_int)]
    lib.sr_read_image.argtypes = [c_char_p, u8_p, c_int,
                                  ctypes.POINTER(c_int),
                                  ctypes.POINTER(c_int)]
    lib.sr_read_images.argtypes = [c_char_p, c_int, u8_p, c_int, c_int,
                                   i32_p, i32_p, c_int]
    lib.sr_write_jpeg.argtypes = [c_char_p, u8_p, c_int, c_int, c_int,
                                  c_char_p]
    lib.sr_exif_description.argtypes = [c_char_p, ctypes.c_char_p, c_int]
    lib.sr_biggest_component.argtypes = [f64_p, c_int, c_double, i32_p]
    lib.sr_edt_sq.argtypes = [u8_p, c_int, c_int, f32_p]
    lib.sr_edt_sq.restype = None
    lib.sr_dp_seam.argtypes = [f32_p, c_int, c_int, i32_p]
    lib.sr_dp_seam.restype = None
    lib.sr_read_jpeg_opts.argtypes = [c_char_p, u8_p, ctypes.c_int64,
                                      ctypes.POINTER(c_int),
                                      ctypes.POINTER(c_int), c_int, c_int]
    lib.sr_decode_start.argtypes = [c_char_p, c_int, i32_p, i32_p, i32_p,
                                    i32_p,
                                    ctypes.POINTER(ctypes.c_void_p),
                                    np.ctypeslib.ndpointer(
                                        np.int64, flags="C_CONTIGUOUS"),
                                    i32_p, i32_p, i32_p, c_int]
    lib.sr_probe_jpeg_sampling.argtypes = [c_char_p, ctypes.POINTER(c_int),
                                           ctypes.POINTER(c_int),
                                           ctypes.POINTER(c_int)]
    lib.sr_read_jpeg_raw.argtypes = [c_char_p, u8_p, ctypes.c_int64,
                                     ctypes.POINTER(c_int),
                                     ctypes.POINTER(c_int), c_int]
    lib.sr_decode_start.restype = ctypes.c_void_p
    lib.sr_decode_wait.argtypes = [ctypes.c_void_p, c_int]
    lib.sr_decode_finish.argtypes = [ctypes.c_void_p]
    lib.sr_decode_finish.restype = None


def available() -> bool:
    return lib is not None


def probe_image(path: str) -> Optional[tuple]:
    """Header-only (w, h) probe — no pixel decode; None if unavailable."""
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.sr_probe_image(path.encode(), ctypes.byref(w),
                          ctypes.byref(h)) != 0:
        return None
    return (w.value, h.value)


def probe_jpeg_sampling(path: str) -> Optional[Tuple[int, int, bool]]:
    """Header-only probe: (w, h, is_h2v2_ycc).  None if not a JPEG or
    the lib is unavailable.  is_h2v2_ycc gates the raw-plane decode."""
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    s = ctypes.c_int()
    if lib.sr_probe_jpeg_sampling(path.encode(), ctypes.byref(w),
                                  ctypes.byref(h), ctypes.byref(s)) != 0:
        return None
    return (w.value, h.value, bool(s.value))


def yuv420_layout(w: int, h: int,
                  num8: int = 8) -> Tuple[int, int, int, int]:
    """iMCU-aligned plane strides of the raw 4:2:0 decode at scale
    num8/8: (ya_w, ya_h, ca_w, ca_h); packed buffer =
    ya_w*ya_h + 2*ca_w*ca_h.  w/h are the FULL (unscaled) dims."""
    ya_w = -(-w // 16) * 2 * num8
    ya_h = -(-h // 16) * 2 * num8
    return (ya_w, ya_h, ya_w // 2, ya_h // 2)


def read_jpeg_yuv420(path: str,
                     num8: int = 8) -> Optional[Tuple[np.ndarray, int, int]]:
    """Raw-plane 4:2:0 decode at DCT scale num8/8: (packed u8 buffer,
    w, h) with w/h the SCALED output dims; None on unavailability or
    unsupported sampling.  Plane layout per `yuv420_layout` (Y, Cb, Cr,
    iMCU-aligned strides at the scaled size)."""
    if lib is None:
        return None
    probe = probe_jpeg_sampling(path)
    if probe is None or not probe[2]:
        return None
    w0, h0, _ = probe
    ya_w, ya_h, ca_w, ca_h = yuv420_layout(w0, h0, num8)
    out = np.empty(ya_w * ya_h + 2 * ca_w * ca_h, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.sr_read_jpeg_raw(path.encode(), out, out.size,
                              ctypes.byref(w), ctypes.byref(h), num8)
    if rc != 0:
        return None
    return out, w.value, h.value


def read_image(path: str) -> Optional[np.ndarray]:
    """Decode JPEG/PNG to uint8 RGB; None if unavailable/failed."""
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.sr_probe_image(path.encode(), ctypes.byref(w),
                          ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.sr_read_image(path.encode(), out, out.size,
                           ctypes.byref(w), ctypes.byref(h))
    return out if rc == 0 else None


def read_images(paths: Sequence[str],
                nthreads: int = 4) -> Optional[List[np.ndarray]]:
    """Threaded batch decode (decode overlaps device compute)."""
    if lib is None or not paths:
        return None
    dims = []
    for p in paths:
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.sr_probe_image(p.encode(), ctypes.byref(w),
                              ctypes.byref(h)) != 0:
            return None
        dims.append((h.value, w.value))
    max_h = max(d[0] for d in dims)
    max_w = max(d[1] for d in dims)
    n = len(paths)
    out = np.empty((n, max_h, max_w, 3), np.uint8)
    ws = np.zeros(n, np.int32)
    hs = np.zeros(n, np.int32)
    joined = "\n".join(paths).encode()
    rc = lib.sr_read_images(joined, n, out, max_w, max_h, ws, hs, nthreads)
    if rc != 0:
        return None
    return [np.ascontiguousarray(out[i, :hs[i], :ws[i]]) for i in range(n)]


def scaled_dims(w: int, h: int, num8: int) -> Tuple[int, int]:
    """libjpeg DCT-scaled output dims for scale num8/8 (num8 in 1..8):
    ceil(dim * num8 / 8) per jpeg_calc_output_dimensions."""
    return (-(-w * num8 // 8), -(-h * num8 // 8))


def read_image_opts(path: str, gray: bool = False,
                    num8: int = 8) -> Optional[np.ndarray]:
    """JPEG decode with luma-only and/or DCT num8/8 scaling (num8 1..8).

    Returns (H, W) uint8 when gray else (H, W, 3); None if unavailable.
    """
    if lib is None:
        return None
    wh = probe_image(path)
    if wh is None:
        return None
    ow, oh = scaled_dims(wh[0], wh[1], num8)
    shape = (oh, ow) if gray else (oh, ow, 3)
    out = np.empty(shape, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.sr_read_jpeg_opts(path.encode(), out, out.size,
                               ctypes.byref(w), ctypes.byref(h),
                               1 if gray else 0, num8)
    if rc != 0 or (w.value, h.value) != (ow, oh):
        return None
    return out


class DecodeSession:
    """Background-thread decode of a list of (path, gray, num8) items.

    Buffers are preallocated from header probes; `wait(i)` blocks (GIL
    released inside ctypes) until item i is decoded and returns its array.
    The worker threads decode ahead while the caller uploads — decode of
    item i+1 overlaps the tunnel transfer of item i even on one core.
    """

    def __init__(self, items: Sequence[Tuple],
                 nthreads: int = 2, delta: bool = False):
        """items: (path, gray, num8[, raw]).  raw=True decodes packed
        4:2:0 Y/Cb/Cr planes (`yuv420_layout`) as a flat u8 buffer —
        precondition: the file is h2v2 YCbCr (caller probes).
        delta=True: each non-raw decoded buffer is row-delta-encoded
        (wrapping mod-256 horizontal difference) in place on the worker
        thread — for LZ-compressed transports; invert with a wrapping u8
        prefix sum along the row axis."""
        assert lib is not None
        n = len(items)
        self._arrays: List[np.ndarray] = []
        grays = np.zeros(n, np.int32)
        num8s = np.full(n, 8, np.int32)
        raws = np.zeros(n, np.int32)
        caps = np.zeros(n, np.int64)
        ptrs = (ctypes.c_void_p * n)()
        paths = []
        for i, item in enumerate(items):
            path, gray, num8 = item[0], item[1], item[2]
            raw = bool(item[3]) if len(item) > 3 else False
            wh = probe_image(path)
            if wh is None:
                raise OSError(f"cannot probe {path}")
            if raw:
                ya_w, ya_h, ca_w, ca_h = yuv420_layout(wh[0], wh[1], num8)
                arr = np.empty(ya_w * ya_h + 2 * ca_w * ca_h, np.uint8)
            else:
                ow, oh = scaled_dims(wh[0], wh[1], num8)
                arr = np.empty((oh, ow) if gray else (oh, ow, 3), np.uint8)
            self._arrays.append(arr)
            grays[i] = 1 if gray else 0
            num8s[i] = num8
            raws[i] = 1 if raw else 0
            caps[i] = arr.size
            ptrs[i] = arr.ctypes.data
            paths.append(path)
        self._ws = np.zeros(n, np.int32)
        self._hs = np.zeros(n, np.int32)
        self._rcs = np.zeros(n, np.int32)
        deltas = np.full(n, 1 if delta else 0, np.int32)
        self._handle = lib.sr_decode_start(
            "\n".join(paths).encode(), n, grays, num8s, deltas, raws,
            ptrs, caps, self._ws, self._hs, self._rcs, nthreads)
        self._finished = False

    def wait(self, i: int) -> np.ndarray:
        rc = lib.sr_decode_wait(self._handle, i)
        if rc != 0:
            raise OSError(f"decode failed for item {i} (rc={rc})")
        return self._arrays[i]

    def finish(self) -> None:
        if not self._finished and self._handle:
            lib.sr_decode_finish(self._handle)
            self._finished = True

    def __del__(self):  # pragma: no cover - GC safety net
        try:
            self.finish()
        except Exception:
            pass


def write_jpeg(path: str, img: np.ndarray, quality: int = 95,
               exif_description_text: Optional[str] = None) -> bool:
    if lib is None:
        return False
    img = np.ascontiguousarray(img, np.uint8)
    rc = lib.sr_write_jpeg(
        path.encode(), img, img.shape[1], img.shape[0], quality,
        exif_description_text.encode() if exif_description_text else None)
    return rc == 0


def exif_description(path: str) -> Optional[str]:
    """ImageDescription payload; None when missing or lib unavailable."""
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(65536)
    rc = lib.sr_exif_description(path.encode(), buf, len(buf))
    if rc < 0:
        return None
    return buf.value.decode("utf-8", errors="replace")


def biggest_component(conf: np.ndarray,
                      thresh: float) -> Optional[List[int]]:
    if lib is None:
        return None
    conf = np.ascontiguousarray(conf, np.float64)
    n = conf.shape[0]
    kept = np.zeros(n, np.int32)
    k = lib.sr_biggest_component(conf, n, thresh, kept)
    return [int(i) for i in kept[:k]]


def edt_sq(mask: np.ndarray) -> Optional[np.ndarray]:
    """Exact squared distance to the nearest zero pixel, O(HW)."""
    if lib is None:
        return None
    mask = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    out = np.empty(mask.shape, np.float32)
    lib.sr_edt_sq(mask, mask.shape[0], mask.shape[1], out)
    return out


def dp_seam(cost: np.ndarray) -> Optional[np.ndarray]:
    """Min-cost vertical seam columns per row."""
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float32)
    out = np.zeros(cost.shape[0], np.int32)
    lib.sr_dp_seam(cost, cost.shape[0], cost.shape[1], out)
    return out
