"""image_stitching_tpu — a TPU-native (JAX/XLA/Pallas) panorama stitching framework.

A ground-up rebuild of the capabilities of a1q123456/image_stitching
(reference mounted at /root/reference) designed TPU-first: batched static
shapes, vmap over images/pairs, Pallas kernels on the hot paths, and
jax.sharding meshes for scale-out. See SURVEY.md for the capability map.
"""

import jax as _jax

# Geometry (3x3 rotation chains, DLT solves, BA Jacobians) needs true f32
# matmuls; TPU defaults to bf16 inputs otherwise.  The hot image-plane ops
# opt into lower precision explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
