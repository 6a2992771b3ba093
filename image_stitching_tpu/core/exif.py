"""EXIF sensor-prior ingestion and synthesis.

The rig's capture app stores camera pose priors in the JPEG EXIF
``ImageDescription`` tag as a ``;``-separated payload
(`/root/reference/image_stitching/image_stitching.cpp:411-524`):

    isPortrait;compassAngle;projMatrix;viewMatrix;cameraTransformMatrix;K

where each matrix is the comma-only square text format of
``parseMatrixStr`` (`serializer.cpp:22-36`).  This module parses the payload
into camera priors with the reference's exact axis-remap semantics, and can
also *write* payloads (the reference's sample data is an unmaterialized LFS
pointer, so synthetic captures need to author their own EXIF).

The libexif dependency is replaced by pure-Python TIFF/EXIF parsing (reads)
and PIL (writes); no native code is needed for a 1 KB tag.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from .persistence import parse_matrix_str

__all__ = [
    "SensorPrior", "parse_image_description", "sensor_prior_to_camera",
    "read_image_description", "format_image_description",
    "camera_to_image_description",
]

IMAGE_DESCRIPTION_TAG = 270  # EXIF_TAG_IMAGE_DESCRIPTION


@dataclasses.dataclass
class SensorPrior:
    """Parsed ImageDescription payload (fields per `:419-439`)."""
    is_portrait: bool
    compass_angle: float
    proj: np.ndarray            # 4x4
    view: np.ndarray            # 4x4
    cam_transform: np.ndarray   # 4x4
    k: np.ndarray               # 3x3


def parse_image_description(payload: str) -> SensorPrior:
    """Split on ';' into the six fields (`image_stitching.cpp:419-444`)."""
    parts = payload.split(";")
    if len(parts) < 6:
        raise ValueError(
            f"ImageDescription payload has {len(parts)} fields, expected 6")
    is_portrait = bool(int(parts[0].strip() or 0))
    compass = float(parts[1]) if parts[1].strip() else 0.0
    proj = parse_matrix_str(parts[2])
    view = parse_matrix_str(parts[3])
    cam_t = parse_matrix_str(parts[4])
    k = parse_matrix_str(parts[5])
    return SensorPrior(is_portrait, compass, proj, view, cam_t, k)


def sensor_prior_to_camera(prior: SensorPrior):
    """Prior -> (focal, aspect, ppx, ppy, R, t), reference semantics.

    `image_stitching.cpp:452-517`: aspect=1; focal=K[1][1]; principal point
    swapped when portrait; R/t from the 4x4 camera transform; then the
    rotation is converted to a quaternion and axis-remapped —
    portrait: (y, x, -z, w); landscape: (-x, y, -z, w) — and back.
    """
    k = prior.k
    focal = float(k[1, 1])
    if prior.is_portrait:
        ppx, ppy = float(k[1, 2]), float(k[0, 2])
    else:
        ppx, ppy = float(k[0, 2]), float(k[1, 2])
    R = prior.cam_transform[:3, :3].astype(np.float64)
    t = prior.cam_transform[:3, 3].astype(np.float64)
    # Pure-numpy quaternion math (scipy also uses [x, y, z, w]): EXIF
    # ingestion must never touch the device — the first tiny device op in
    # a process can stall minutes through the tunnel.
    from scipy.spatial.transform import Rotation as _R
    x, y, z, w = _R.from_matrix(R).as_quat()
    if prior.is_portrait:
        q2 = [y, x, -z, w]
    else:
        q2 = [-x, y, -z, w]
    R2 = _R.from_quat(q2).as_matrix()
    return focal, 1.0, ppx, ppy, R2.astype(np.float32), t.astype(np.float32)


# --------------------------------------------------------------------------
# Raw EXIF IO.  Reading walks the JPEG APP1 / PNG eXIf TIFF structure with
# pure Python; writing uses PIL (tests also read back through this parser).
# --------------------------------------------------------------------------

def _parse_tiff_image_description(tiff: bytes) -> Optional[str]:
    if len(tiff) < 8:
        return None
    bo = tiff[:2]
    if bo == b"II":
        import struct
        u16 = lambda o: struct.unpack_from("<H", tiff, o)[0]
        u32 = lambda o: struct.unpack_from("<I", tiff, o)[0]
    elif bo == b"MM":
        import struct
        u16 = lambda o: struct.unpack_from(">H", tiff, o)[0]
        u32 = lambda o: struct.unpack_from(">I", tiff, o)[0]
    else:
        return None
    ifd = u32(4)
    if ifd + 2 > len(tiff):
        return None
    count = u16(ifd)
    for i in range(count):
        entry = ifd + 2 + 12 * i
        if entry + 12 > len(tiff):
            break
        tag = u16(entry)
        if tag != IMAGE_DESCRIPTION_TAG:
            continue
        n = u32(entry + 4)
        if n <= 4:
            raw = tiff[entry + 8: entry + 8 + n]
        else:
            off = u32(entry + 8)
            raw = tiff[off: off + n]
        return raw.rstrip(b"\x00").decode("utf-8", errors="replace")
    return None


def read_image_description(path: str) -> Optional[str]:
    """Extract the ImageDescription string from a JPEG or PNG file.

    Functional replacement for the libexif walk at
    `image_stitching.cpp:344-347, :411-416, :525`.  Uses the native C++
    runtime when built; pure-Python parse otherwise.
    """
    from . import native
    if native.available():
        return native.exif_description(path)
    with open(path, "rb") as f:
        head = f.read(2)
        if head == b"\xff\xd8":  # JPEG: scan APP1 segments for Exif.
            while True:
                marker = f.read(2)
                if len(marker) < 2 or marker[0] != 0xFF:
                    return None
                if marker[1] == 0xDA:  # start of scan, no EXIF found
                    return None
                size = int.from_bytes(f.read(2), "big")
                body = f.read(size - 2)
                if marker[1] == 0xE1 and body.startswith(b"Exif\x00\x00"):
                    return _parse_tiff_image_description(body[6:])
        elif head == b"\x89P":  # PNG: look for the eXIf chunk.
            f.seek(8)
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    return None
                length = int.from_bytes(hdr[:4], "big")
                ctype = hdr[4:8]
                data = f.read(length)
                f.read(4)  # crc
                if ctype == b"eXIf":
                    return _parse_tiff_image_description(data)
                if ctype == b"IEND":
                    return None
    return None


def _matrix_str(m: np.ndarray) -> str:
    """Comma-only square matrix text (`parseMatrixStr` input format)."""
    flat = np.asarray(m, dtype=np.float64).reshape(-1)
    return "[" + ",".join(repr(float(v)) for v in flat) + "]"


def format_image_description(is_portrait: bool, compass_angle: float,
                             proj: np.ndarray, view: np.ndarray,
                             cam_transform: np.ndarray,
                             k: np.ndarray) -> str:
    """Author a payload in the exact field order the reference parses."""
    return ";".join([
        str(int(bool(is_portrait))),
        repr(float(compass_angle)),
        _matrix_str(proj),
        _matrix_str(view),
        _matrix_str(cam_transform),
        _matrix_str(k),
    ])


def camera_to_image_description(focal: float, ppx: float, ppy: float,
                                R: np.ndarray, t: np.ndarray = None,
                                is_portrait: bool = False,
                                compass_angle: float = 0.0) -> str:
    """Inverse of the ingestion path: build a payload that, when parsed by
    `sensor_prior_to_camera`, yields exactly (focal, ppx, ppy, R).

    Inverts the axis remap: landscape q_payload = (-x, y, -z, w) of the
    target q (the remap is an involution), portrait swaps (y, x, -z, w).
    """
    R = np.asarray(R, dtype=np.float64)
    from scipy.spatial.transform import Rotation as _R
    x, y, z, w = _R.from_matrix(R).as_quat()
    if is_portrait:
        q_payload = [y, x, -z, w]
    else:
        q_payload = [-x, y, -z, w]
    R_payload = _R.from_quat(q_payload).as_matrix()
    cam_t = np.eye(4)
    cam_t[:3, :3] = R_payload
    if t is not None:
        cam_t[:3, 3] = np.asarray(t, dtype=np.float64)
    k = np.array([[focal, 0.0, ppy if is_portrait else ppx],
                  [0.0, focal, ppx if is_portrait else ppy],
                  [0.0, 0.0, 1.0]])
    view = np.linalg.inv(cam_t)
    proj = np.eye(4)
    return format_image_description(is_portrait, compass_angle, proj, view,
                                    cam_t, k)
