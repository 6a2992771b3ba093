"""Checkpoint/resume serializer with text-format parity to the reference.

Formats (all from `/root/reference/image_stitching/serializer.cpp`):
  * matrix text: ``[a,b;c,d;]`` — ',' between columns, ';' closing every row
    (`serializer.cpp:38-67` write, `:69-111` parse; parse returns float32).
  * EXIF square-matrix text: ``[a,b,c,d]`` — ',' only, length inferred as a
    square (`parseMatrixStr`, `serializer.cpp:22-36`).
  * ``cams.data``: one camera per line, ``aspect@focal@ppx@ppy@t@R``
    (`serializer.cpp:113-167`).
  * ``indices.data``: one kept-image index per line (`serializer.cpp:169-193`).

Numbers are written with C++ ``operator<<`` default 6-significant-digit
formatting for byte-level compatibility with files the reference writes.
"""

from __future__ import annotations

import math
import os
from typing import List, Sequence

import numpy as np

from ..geometry.camera import Cameras

__all__ = [
    "serialize_matrix", "deserialize_matrix", "parse_matrix_str",
    "serialize_camera_params", "deserialize_camera_params",
    "serialize_indices", "deserialize_indices",
]


def _fmt(v: float) -> str:
    """C++ default ostream float formatting (6 significant digits)."""
    if v != v or math.isinf(v):
        return str(v)
    s = f"{float(v):.6g}"
    # C++ prints exponents as e+06 / e-06; Python gives e+06 too via %g.
    return s


def serialize_matrix(m: np.ndarray) -> str:
    """`serializer.cpp:38-67`: ``[a,b;c,d;]``."""
    m = np.asarray(m)
    if m.ndim == 1:
        m = m[:, None]
    parts = ["["]
    for r in range(m.shape[0]):
        row = ",".join(_fmt(m[r, c]) for c in range(m.shape[1]))
        parts.append(row + ";")
    parts.append("]")
    return "".join(parts)


def deserialize_matrix(s: str) -> np.ndarray:
    """`serializer.cpp:69-111`; returns float32 (the reference outputs
    CV_32F regardless of what was written, `:102`)."""
    body = s.strip()
    if body.startswith("["):
        body = body[1:]
    if body.endswith("]"):
        body = body[:-1]
    rows = [r for r in body.split(";") if r.strip() != ""]
    data = [[float(x) for x in row.split(",")] for row in rows]
    return np.asarray(data, dtype=np.float32)


def parse_matrix_str(s: str) -> np.ndarray:
    """`serializer.cpp:22-36`: ``[a,b,...]`` comma-only square matrix,
    row-major; returns float64 (reference builds CV_64F)."""
    body = s.strip()[1:-1]
    items = [float(x) for x in body.split(",")]
    n = int(math.isqrt(len(items)))
    return np.asarray(items[:n * n], dtype=np.float64).reshape(n, n)


def _cams_path(directory: str) -> str:
    return os.path.join(directory, "cams.data")


def _indices_path(directory: str) -> str:
    return os.path.join(directory, "indices.data")


def serialize_camera_params(cams: Cameras, directory: str = ".") -> str:
    """Write ``cams.data`` (`serializer.cpp:113-126`):
    ``aspect@focal@ppx@ppy@[t0;t1;t2;]@[r00,r01,r02;...;]`` per camera."""
    focal = np.asarray(cams.focal, dtype=np.float64)
    aspect = np.asarray(cams.aspect, dtype=np.float64)
    ppx = np.asarray(cams.ppx, dtype=np.float64)
    ppy = np.asarray(cams.ppy, dtype=np.float64)
    R = np.asarray(cams.R, dtype=np.float32)
    t = np.asarray(cams.t, dtype=np.float32)
    path = _cams_path(directory)
    with open(path, "w") as fs:
        for i in range(len(focal)):
            fs.write(f"{_fmt(aspect[i])}@{_fmt(focal[i])}@{_fmt(ppx[i])}@"
                     f"{_fmt(ppy[i])}@{serialize_matrix(t[i][:, None])}@"
                     f"{serialize_matrix(R[i])}\n")
    return path


def deserialize_camera_params(directory: str = ".") -> Cameras:
    """Read ``cams.data`` (`serializer.cpp:128-167`)."""
    focal, aspect, ppx, ppy, Rs, ts = [], [], [], [], [], []
    with open(_cams_path(directory)) as fs:
        for line in fs:
            line = line.strip()
            if not line:
                continue
            a, f, px, py, t_str, r_str = line.split("@")
            aspect.append(float(a))
            focal.append(float(f))
            ppx.append(float(px))
            ppy.append(float(py))
            ts.append(deserialize_matrix(t_str).reshape(-1)[:3])
            Rs.append(deserialize_matrix(r_str).reshape(3, 3))
    n = len(focal)
    return Cameras(
        focal=np.asarray(focal, np.float32),
        aspect=np.asarray(aspect, np.float32),
        ppx=np.asarray(ppx, np.float32),
        ppy=np.asarray(ppy, np.float32),
        R=np.asarray(Rs, np.float32).reshape(n, 3, 3),
        t=np.asarray(ts, np.float32).reshape(n, 3),
    )


def serialize_indices(indices: Sequence[int], directory: str = ".") -> str:
    """Write ``indices.data`` (`serializer.cpp:169-177`)."""
    path = _indices_path(directory)
    with open(path, "w") as fs:
        for i in indices:
            fs.write(f"{int(i)}\n")
    return path


def deserialize_indices(directory: str = ".") -> List[int]:
    """Read ``indices.data`` (`serializer.cpp:179-193`)."""
    out: List[int] = []
    with open(_indices_path(directory)) as fs:
        for line in fs:
            line = line.strip()
            if line:
                out.append(int(line))
    return out
