"""Feature containers: static-shaped, masked, batched.

TPU-first replacement for cv::detail::ImageFeatures (variable-length
keypoint vectors): every image yields exactly ``max_features`` slots with a
validity mask, so detection, description, and matching vmap cleanly over
images and pairs with no ragged shapes (SURVEY.md section 7 'static shapes
everywhere').
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Features:
    """Keypoints + descriptors for one image (or a batch with leading axis).

    xy:       (..., K, 2) float32, keypoint centers in image coords
    response: (..., K)    float32, detector response (Harris score for ORB)
    angle:    (..., K)    float32, orientation in radians
    octave:   (..., K)    int32, pyramid level
    size:     (..., K)    float32, keypoint diameter in image coords
    desc:     (..., K, D) descriptor; uint32 bit-planes for binary (ORB:
              D=8 words = 256 bits), float32 for SIFT-family
    valid:    (..., K)    bool
    """

    xy: Any
    response: Any
    angle: Any
    octave: Any
    size: Any
    desc: Any
    valid: Any

    def tree_flatten(self):
        return ((self.xy, self.response, self.angle, self.octave, self.size,
                 self.desc, self.valid), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_features(self) -> int:
        return self.xy.shape[-2]

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def __getitem__(self, idx) -> "Features":
        return jax.tree.map(lambda x: x[idx], self)

    @classmethod
    def stack(cls, feats) -> "Features":
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *feats)

    def to_numpy(self) -> "Features":
        return jax.tree.map(np.asarray, self)
