"""Pipeline orchestration (the reference's main() as a library)."""

from .stitcher import stitch, StitchResult
