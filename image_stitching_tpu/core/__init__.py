"""Host-side core: config, IO, EXIF priors, rig model, persistence, logging."""

from . import exif, image_io, persistence, rig
from .logging import logger, stage_timer
