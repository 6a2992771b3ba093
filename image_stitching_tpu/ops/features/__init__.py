"""Feature detector families (the reference's orb/akaze/sift/surf set)."""

from .types import Features
from .orb import orb_detect_and_describe
