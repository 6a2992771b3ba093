"""Synthetic datasets with ground truth (the LFS samples are absent)."""

from . import synth
