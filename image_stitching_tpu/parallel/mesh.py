"""Device meshes for scale-out (SURVEY.md section 2c / 5).

The reference is single-process with optional CUDA intra-op offload; the
TPU-native scale-out axes are:
  * ``dp`` — data parallel over images / image pairs / whole stitches
    (the reference's `for (int i...)` loops at image_stitching.cpp:567,
    :975, :1086 become sharded batch axes);
  * ``sp`` — spatial parallel over the panorama canvas (gigapixel
    compositing; the ring-attention analogue with neighbor halos).

Collectives ride ICI within a slice; DCN only for multi-host dp.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding", "Mesh", "shard_batch"]


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("dp", "sp"),
              devices=None) -> Mesh:
    """Create a mesh over available devices.

    Default: all devices on the dp axis, sp=1.  Pass shape=(dp, sp) to
    split; shapes multiply to <= device count.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    mesh_devices = mesh_utils.create_device_mesh(shape, devices=devices[
        :int(np.prod(shape))])
    return Mesh(mesh_devices, axis_names)


def shard_batch(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for a leading batch axis."""
    return NamedSharding(mesh, P(axis))
