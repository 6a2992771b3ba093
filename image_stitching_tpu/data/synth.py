"""Synthetic panorama captures with ground-truth K/R and EXIF payloads.

The reference's only dataset (`samples/samples.zip`) is an unmaterialized
Git-LFS pointer (SURVEY.md section 0), so reproducible tests and benchmarks
render their own captures: a procedural spherical environment texture is
sampled through known camera intrinsics/rotations (the same ray model the
warpers use), optionally written as JPEGs carrying the reference's EXIF
ImageDescription payload so the full ingestion path
(`image_stitching.cpp:340-528`) is exercised.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core import exif as exif_mod
from ..core import image_io
from ..core.rig import CaptureRig, DEFAULT_RIG
from ..geometry.euler import euler_to_rotation_matrix
from ..geometry.euler_order import EulerOrder

__all__ = ["sphere_texture_rgb", "render_view", "make_ring_captures",
           "write_capture_dir"]


def sphere_texture_rgb(lon: np.ndarray, lat: np.ndarray,
                       seed: int = 7, detail: bool = False) -> np.ndarray:
    """Smooth, feature-rich procedural texture on the sphere.

    Sum of random spherical harmonics-ish trig products per channel plus
    high-frequency detail so ORB/SIFT find corners everywhere.

    detail=True compresses the base layers into [0.15, 0.85] headroom
    BEFORE the cell-noise octaves: the default hard clip saturates whole
    lon/lat bands flat (box rects sum past the range), which starves
    narrow-fov views of corners — a 100-tile 8-deg mosaic had images
    with 33 keypoints in such a band.  Default (False) preserves the
    exact texture existing caches/tests were rendered from.
    """
    rng = np.random.default_rng(seed)
    out = np.zeros(lon.shape + (3,), np.float32)
    for c in range(3):
        acc = np.zeros_like(lon, np.float32)
        for _ in range(6):
            fl = rng.integers(1, 9)
            fm = rng.integers(1, 9)
            ph1, ph2 = rng.uniform(0, 2 * np.pi, 2)
            acc += rng.uniform(0.3, 1.0) * np.sin(fl * lon + ph1) * \
                np.cos(fm * lat + ph2)
        acc = (acc - acc.min()) / max(acc.max() - acc.min(), 1e-6)
        out[..., c] = acc
    # Corner-rich structure: sharp-edged random lon/lat rectangles (FAST
    # needs strong intensity steps, not smooth gradients).  Each box is
    # evaluated only on the rows whose [min, max] latitude range can
    # intersect it — identical output to the full-array test (rows outside
    # the range cannot satisfy `la <= lat < la+dla`), but ~15x faster at
    # bench resolutions where most boxes miss the view entirely.  The rng
    # call sequence (lo, la, dlo, dla, color) matches the original loop
    # exactly, so cached captures regenerate bit-identically.
    row_lo = lat.min(axis=-1)
    row_hi = lat.max(axis=-1)
    for _ in range(400):
        lo = rng.uniform(-np.pi, np.pi)
        la = rng.uniform(-1.35, 1.15)
        dlo = rng.uniform(0.02, 0.22)
        dla = rng.uniform(0.02, 0.16)
        color = rng.uniform(-0.9, 0.9, 3).astype(np.float32)
        cand = np.nonzero((row_hi >= la) & (row_lo < la + dla))[0]
        if cand.size == 0:
            continue
        r0, r1 = int(cand[0]), int(cand[-1]) + 1
        sublon = lon[r0:r1]
        sublat = lat[r0:r1]
        dlon = np.mod(sublon - lo + np.pi, 2 * np.pi) - np.pi
        box = (dlon >= 0) & (dlon < dlo) & (sublat >= la) & \
            (sublat < la + dla)
        out[r0:r1][box] += color
    # Multi-octave cell noise anchored in world (lon, lat): piecewise-
    # constant cells at several angular scales give every view pixel-scale
    # corners that stay consistent across cameras (detectors need texture
    # at capture resolution, not just the box edges).
    def cell_hash(u, v, salt):
        s = np.sin(u * 127.1 + v * 311.7 + salt) * 43758.547
        return (s - np.floor(s)).astype(np.float32)
    if detail:
        # Compress saturated base into headroom so the cell octaves
        # survive everywhere (narrow-fov captures need them).
        out = np.clip(out, 0.0, 1.0) * 0.7 + 0.15
    for amp, scale in ((0.22, 60.0), (0.15, 220.0), (0.12, 800.0)):
        cu = np.floor(lon * scale)
        cv = np.floor(lat * scale)
        for c in range(3):
            out[..., c] += amp * (cell_hash(cu, cv, 17.0 * c + 1.0) - 0.5)
    out = np.clip(out, 0.0, 1.0)
    return (out * 255.0).astype(np.float32)


def render_view(k: np.ndarray, r: np.ndarray, hw: Tuple[int, int],
                seed: int = 7, detail: bool = False) -> np.ndarray:
    """Render the sphere texture seen by a camera: ray = R K^-1 p."""
    h, w = hw
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64) + 0.0
    pts = np.stack([xs, ys, np.ones_like(xs)], -1)
    rk = np.asarray(r, np.float64) @ np.linalg.inv(np.asarray(k, np.float64))
    rays = pts @ rk.T
    norm = np.linalg.norm(rays, axis=-1)
    lon = np.arctan2(rays[..., 0], rays[..., 2])
    lat = np.arcsin(np.clip(rays[..., 1] / np.maximum(norm, 1e-12), -1, 1))
    return sphere_texture_rgb(lon.astype(np.float32),
                              lat.astype(np.float32), seed, detail=detail)


def make_ring_captures(n_images: int = 4, hw: Tuple[int, int] = (240, 320),
                       fov_deg: float = 55.0, pitch_deg: float = 0.0,
                       overlap_ratio: float = 0.45, seed: int = 7,
                       rng_noise: float = 0.0, texture_detail: bool = False):
    """A single-ring horizontal panorama: returns (images, K, Rs).

    Consecutive yaw step = fov * (1 - overlap_ratio) so neighbors overlap.
    """
    h, w = hw
    focal = (w / 2.0) / math.tan(math.radians(fov_deg) / 2.0)
    k = np.array([[focal, 0, w / 2.0], [0, focal, h / 2.0], [0, 0, 1]],
                 np.float64)
    step = math.radians(fov_deg) * (1.0 - overlap_ratio)
    rng = np.random.default_rng(seed)
    images, rs = [], []
    for i in range(n_images):
        yaw = i * step
        jitter = rng.normal(0, rng_noise, 3) if rng_noise else np.zeros(3)
        eul = np.array([math.radians(pitch_deg) + jitter[0],
                        yaw + jitter[1], jitter[2]], np.float32)
        r = np.asarray(euler_to_rotation_matrix(eul, EulerOrder.YXZ),
                       np.float64)
        view = render_view(k, r, hw, seed, detail=texture_detail)
        # Per-view sensor noise: real captures never match perfectly, and
        # the reference's near-duplicate heuristic (conf > 3 -> 0,
        # matchers.cpp) zeroes pairs whose inlier ratio is too perfect.
        view = view + rng.normal(0.0, 4.0, view.shape).astype(np.float32)
        images.append(np.clip(view, 0.0, 255.0))
        rs.append(r.astype(np.float32))
    return images, k.astype(np.float32), np.stack(rs)


def make_rig_captures(hw: Tuple[int, int] = (240, 320),
                      fov_deg: float = 68.0, rig: CaptureRig = DEFAULT_RIG,
                      seed: int = 7, noise_sigma: float = 4.0,
                      n_images: Optional[int] = None):
    """Render the reference's full capture rig: 37 images in 5 pitch rings
    ({0, 34, 72, -36, -72} deg holding {11, 9, 4, 9, 4} images —
    `image_stitching.cpp:96-102`), with per-image yaw from the rig's own
    `rotation_prior`.  Returns (images, K, Rs)."""
    h, w = hw
    focal = (w / 2.0) / math.tan(math.radians(fov_deg) / 2.0)
    k = np.array([[focal, 0, w / 2.0], [0, focal, h / 2.0], [0, 0, 1]],
                 np.float64)
    rng = np.random.default_rng(seed)
    n = rig.total_images if n_images is None else n_images
    images, rs = [], []
    for i in range(n):
        pitch, yaw, roll = rig.rotation_prior(i)
        eul = np.array([pitch, yaw, roll], np.float32)
        r = np.asarray(euler_to_rotation_matrix(eul, EulerOrder.YXZ),
                       np.float64)
        view = render_view(k, r, hw, seed)
        view = view + rng.normal(0.0, noise_sigma, view.shape).astype(
            np.float32)
        images.append(np.clip(view, 0.0, 255.0))
        rs.append(r.astype(np.float32))
    return images, k.astype(np.float32), np.stack(rs)


def write_capture_dir(directory: str, images: Sequence[np.ndarray],
                      k: np.ndarray, rs: np.ndarray,
                      with_exif: bool = True) -> List[str]:
    """Write numbered JPEGs (+EXIF pose payloads) the pipeline can ingest.

    The reference rotates landscape captures 180 degrees on load
    (`image_stitching.cpp:576-580`), so frames are pre-rotated 180 here;
    `orient_capture` then restores the rendered view exactly.
    """
    os.makedirs(directory, exist_ok=True)
    paths = []
    for i, img in enumerate(images):
        path = os.path.join(directory, f"{i}.jpg")
        stored = image_io.rotate_180(np.clip(img, 0, 255).astype(np.uint8))
        if with_exif:
            payload = exif_mod.camera_to_image_description(
                focal=float(k[1, 1]), ppx=float(k[0, 2]),
                ppy=float(k[1, 2]), R=rs[i], is_portrait=False)
            image_io.write_jpeg_with_description(path, stored, payload,
                                                 quality=92)
        else:
            image_io.imwrite(path, stored, quality=92)
        paths.append(path)
    return paths
