"""Host-side image IO: decode/encode, directory scan, orientation rotate.

Covers the reference's ingestion and output edges
(`/root/reference/image_stitching/image_stitching.cpp:306-335` directory
scan + numeric-prefix sort, `:569-580`/`:1091-1103` decode+rotate,
`:1228` result write).  Codec work stays on host (PIL); everything after
decode is device arrays.

Images are returned as uint8 RGB ``(H, W, 3)`` numpy arrays.  NOTE: the
reference works in OpenCV BGR order; channel order is irrelevant to every
algorithm here (it only permutes channels), so we standardize on RGB.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

__all__ = [
    "list_images", "imread", "imwrite", "probe_oriented_size",
    "rotate_90_cw", "rotate_180",
    "orient_capture", "write_jpeg_with_description",
]

_EXTS = {".jpg", ".jpeg", ".png"}  # case-insensitive, per :311-316


def list_images(directory: str) -> List[str]:
    """Scan a directory for jpg/jpeg/png and sort by numeric filename prefix
    (strtol semantics: leading integer, 0 when none) —
    `image_stitching.cpp:306-335`."""
    entries = []
    for name in os.listdir(directory):
        path = os.path.join(directory, name)
        if not os.path.isfile(path):
            continue
        ext = os.path.splitext(name)[1].lower()
        if ext in _EXTS:
            entries.append(path)

    def strtol_prefix(p: str) -> int:
        m = re.match(r"\s*[+-]?\d+", os.path.basename(p))
        return int(m.group()) if m else 0

    entries.sort(key=strtol_prefix)
    return entries


def imread(path: str) -> np.ndarray:
    """Decode to uint8 RGB (H, W, 3) — native libjpeg/libpng runtime when
    built, PIL otherwise."""
    from . import native
    img = native.read_image(path)
    if img is not None:
        return img
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def imread_batch(paths, nthreads: int = 4):
    """Threaded batch decode via the native runtime (decode overlaps device
    compute); PIL loop fallback."""
    from . import native
    out = native.read_images(list(paths), nthreads)
    if out is not None:
        return out
    return [imread(p) for p in paths]


def probe_oriented_size(path: str, is_portrait: bool) -> Tuple[int, int]:
    """(w, h) AFTER orient_capture, from the codec header only (no pixel
    decode) — lets the pipeline compute scales before decoding anything."""
    from . import native
    wh = native.probe_image(path)
    if wh is None:
        with Image.open(path) as im:
            wh = im.size  # (w, h), header-only
    w, h = wh
    return (h, w) if is_portrait else (w, h)


def imwrite(path: str, img: np.ndarray, quality: int = 95) -> None:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    Image.fromarray(img).save(path, quality=quality)


def rotate_90_cw(img: np.ndarray) -> np.ndarray:
    """cv::ROTATE_90_CLOCKWISE (`image_stitching.cpp:573`)."""
    return np.ascontiguousarray(np.rot90(img, k=-1, axes=(0, 1)))


def rotate_180(img: np.ndarray) -> np.ndarray:
    """cv::ROTATE_180 (`image_stitching.cpp:578`)."""
    return np.ascontiguousarray(img[::-1, ::-1])


def orient_capture(img: np.ndarray, is_portrait: bool) -> np.ndarray:
    """The rig's fixed orientation fix: portrait captures rotate 90 deg CW,
    landscape rotate 180 (`image_stitching.cpp:571-580`)."""
    return rotate_90_cw(img) if is_portrait else rotate_180(img)


def write_jpeg_with_description(path: str, img: np.ndarray,
                                description: str,
                                quality: int = 95) -> None:
    """Write a JPEG carrying an EXIF ImageDescription payload (used by the
    synthetic-capture generator; the rig app does this in production)."""
    from .exif import IMAGE_DESCRIPTION_TAG
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    pil = Image.fromarray(img)
    exif = Image.Exif()
    exif[IMAGE_DESCRIPTION_TAG] = description
    pil.save(path, quality=quality, exif=exif)
