"""Jitted compute ops: image processing, features, matching, warps."""

from . import imgproc, warps, ransac, matching
