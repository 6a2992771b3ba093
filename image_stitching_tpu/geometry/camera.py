"""Camera model: a batched, jit-friendly analogue of cv::detail::CameraParams.

The reference stores one CameraParams per image (focal, aspect, ppx, ppy,
R, t — see usage at `/root/reference/image_stitching/image_stitching.cpp:150-167`
`createCamera`).  TPU-first redesign: one `Cameras` pytree holding *stacked*
arrays for all N images, so every downstream op (warp, BA, exposure) can vmap
over the leading axis without Python loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Cameras", "make_k", "get_fov"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Cameras:
    """Stacked camera parameters for N images.

    focal, aspect, ppx, ppy: ``(N,)`` float arrays.
    R: ``(N, 3, 3)`` rotations; t: ``(N, 3)`` translations.

    Per-field semantics match cv::detail::CameraParams: the intrinsic matrix
    is ``K = [[f, 0, ppx], [0, f*aspect, ppy], [0, 0, 1]]``.
    """

    focal: Any
    aspect: Any
    ppx: Any
    ppy: Any
    R: Any
    t: Any

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return ((self.focal, self.aspect, self.ppx, self.ppy, self.R,
                 self.t), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors ------------------------------------------------------
    @classmethod
    def identity(cls, n: int, focal: float = 1.0) -> "Cameras":
        return cls(
            focal=jnp.full((n,), focal, jnp.float32),
            aspect=jnp.ones((n,), jnp.float32),
            ppx=jnp.zeros((n,), jnp.float32),
            ppy=jnp.zeros((n,), jnp.float32),
            R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3)),
            t=jnp.zeros((n, 3), jnp.float32),
        )

    @classmethod
    def stack(cls, cams: "list[Cameras]") -> "Cameras":
        return jax.tree.map(lambda *xs: jnp.concatenate(
            [jnp.atleast_1d(x) for x in xs], axis=0), *cams)

    # -- accessors ----------------------------------------------------------
    def __len__(self) -> int:
        return int(np.asarray(self.focal).shape[0])

    def __getitem__(self, idx) -> "Cameras":
        return jax.tree.map(lambda x: x[idx], self)

    def K(self) -> jnp.ndarray:
        """``(N, 3, 3)`` intrinsics (cv::detail::CameraParams::K parity)."""
        return make_k(self.focal, self.aspect, self.ppx, self.ppy)

    def scaled(self, scale) -> "Cameras":
        """Scale intrinsics (focal/ppx/ppy) as at
        `image_stitching.cpp:626-638` and `:1123-1125`."""
        return dataclasses.replace(
            self, focal=self.focal * scale, ppx=self.ppx * scale,
            ppy=self.ppy * scale)


def make_k(focal, aspect, ppx, ppy):
    """Build ``(..., 3, 3)`` K from scalar fields (CameraParams::K).

    Stays in numpy when every input is host-resident: host callers
    (`np.asarray(cameras.K())` in the warp/compose stages) otherwise
    pay a device round trip — one ~27 ms tunnel sync each through
    axon.  Traced/device inputs keep the jnp path."""
    xp = (jnp if any(isinstance(a, jax.Array)
                     for a in (focal, aspect, ppx, ppy)) else np)
    focal = xp.asarray(focal)
    zero = xp.zeros_like(focal)
    one = xp.ones_like(focal)
    row0 = xp.stack([focal, zero, ppx * one], axis=-1)
    row1 = xp.stack([zero, focal * aspect, ppy * one], axis=-1)
    row2 = xp.stack([zero, zero, one], axis=-1)
    return xp.stack([row0, row1, row2], axis=-2)


def get_fov(cam: Cameras):
    """Field of view from K — parity with `image_stitching.cpp:175-186`
    (note the reference's formula: fov = 2*atan(pp / f))."""
    k = cam.K()
    fov_x = 2.0 * jnp.arctan(cam.ppx / k[..., 0, 0])
    fov_y = 2.0 * jnp.arctan(cam.ppy / k[..., 1, 1])
    return fov_x, fov_y
