"""Timelapser: the alternative per-frame compositing output mode.

Replaces cv::detail::Timelapser/TimelapserCrop as used at
`/root/reference/image_stitching/image_stitching.cpp:79, :1194-1215`
(timelapse=false by default; when on, each warped frame is written onto a
fixed canvas and saved as ``fixed_<name>``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..config import TimelapserType
from .warps import result_roi, result_roi_intersection

__all__ = ["Timelapser", "fixed_name"]


class Timelapser:
    def __init__(self, corners, sizes,
                 kind: TimelapserType = TimelapserType.CROP):
        if kind == TimelapserType.CROP:
            self.roi = result_roi_intersection(corners, sizes)
        else:
            self.roi = result_roi(corners, sizes)
        self.kind = kind
        self._reset()

    def _reset(self):
        x, y, w, h = self.roi
        self.canvas = jnp.zeros((max(h, 1), max(w, 1), 3), jnp.float32)

    def process(self, img, mask, corner):
        """Timelapser::process: paste the frame at its corner (clipped to
        the canvas); returns the canvas for this frame."""
        self._reset()
        img = jnp.asarray(img, jnp.float32)
        x0, y0, cw, ch = self.roi
        h, w = img.shape[:2]
        # Clip the paste rect against the canvas.
        sx = max(corner[0], x0)
        sy = max(corner[1], y0)
        ex = min(corner[0] + w, x0 + cw)
        ey = min(corner[1] + h, y0 + ch)
        if ex <= sx or ey <= sy:
            return self.canvas
        sub = img[sy - corner[1]:ey - corner[1], sx - corner[0]:ex - corner[0]]
        self.canvas = jax.lax.dynamic_update_slice(
            self.canvas, sub, (sy - y0, sx - x0, 0))
        return self.canvas

    def get_dst(self):
        return self.canvas


def fixed_name(path: str) -> str:
    """``fixed_<basename>`` naming from `image_stitching.cpp:1204-1213`."""
    return "fixed_" + os.path.basename(path)
