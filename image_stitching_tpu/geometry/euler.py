"""Euler angle <-> rotation matrix conversions for all six orders.

TPU-native re-design of `/root/reference/image_stitching/euler.h`:
  euler.h:4-133    rotationMatrixToEulerAngles -> rotation_matrix_to_euler
  euler.h:135-300  eulerAnglesToRotationMatrix -> euler_to_rotation_matrix

Angles are ``(..., 3)`` arrays ``[x, y, z]`` in radians; matrices are
``(..., 3, 3)``.  The gimbal-lock guard uses the same 0.9999999 threshold as
the reference.  Everything is branchless/batched (the order itself must be a
static Python value, as in the reference where it is a template parameter).
"""

from __future__ import annotations

import jax.numpy as jnp

from .euler_order import EulerOrder

__all__ = ["euler_to_rotation_matrix", "rotation_matrix_to_euler"]

_GIMBAL_EPS = 0.9999999


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([one, zero, zero], axis=-1),
        jnp.stack([zero, c, -s], axis=-1),
        jnp.stack([zero, s, c], axis=-1),
    ], axis=-2)


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, zero, s], axis=-1),
        jnp.stack([zero, one, zero], axis=-1),
        jnp.stack([-s, zero, c], axis=-1),
    ], axis=-2)


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, -s, zero], axis=-1),
        jnp.stack([s, c, zero], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)


_AXIS_ROT = {"X": _rot_x, "Y": _rot_y, "Z": _rot_z}
_AXIS_IDX = {"X": 0, "Y": 1, "Z": 2}


def euler_to_rotation_matrix(euler: jnp.ndarray, order: EulerOrder) -> jnp.ndarray:
    """Compose axis rotations in the order string's sequence.

    ``XYZ`` -> ``Rx(x) @ Ry(y) @ Rz(z)`` etc.  Matches the expanded
    per-order matrices at `euler.h:135-300`.
    """
    euler = jnp.asarray(euler)
    order = EulerOrder(order)
    mats = []
    for axis in order.value:
        ang = euler[..., _AXIS_IDX[axis]]
        mats.append(_AXIS_ROT[axis](ang))
    return mats[0] @ mats[1] @ mats[2]


def rotation_matrix_to_euler(m: jnp.ndarray, order: EulerOrder) -> jnp.ndarray:
    """Extract Euler angles; matches `euler.h:4-133` including the
    gimbal-lock fallbacks (|sin| >= 0.9999999 collapses one angle to 0)."""
    m = jnp.asarray(m)
    m11, m12, m13 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m21, m22, m23 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m31, m32, m33 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    zero = jnp.zeros_like(m11)
    clamp = lambda v: jnp.clip(v, -1.0, 1.0)
    order = EulerOrder(order)

    if order == EulerOrder.XYZ:
        y = jnp.arcsin(clamp(m13))
        ok = jnp.abs(m13) < _GIMBAL_EPS
        x = jnp.where(ok, jnp.arctan2(-m23, m33), jnp.arctan2(m32, m22))
        z = jnp.where(ok, jnp.arctan2(-m12, m11), zero)
    elif order == EulerOrder.YXZ:
        x = jnp.arcsin(-clamp(m23))
        ok = jnp.abs(m23) < _GIMBAL_EPS
        y = jnp.where(ok, jnp.arctan2(m13, m33), jnp.arctan2(-m31, m11))
        z = jnp.where(ok, jnp.arctan2(m21, m22), zero)
    elif order == EulerOrder.ZXY:
        x = jnp.arcsin(clamp(m32))
        ok = jnp.abs(m32) < _GIMBAL_EPS
        y = jnp.where(ok, jnp.arctan2(-m31, m33), zero)
        z = jnp.where(ok, jnp.arctan2(-m12, m22), jnp.arctan2(m21, m11))
    elif order == EulerOrder.ZYX:
        y = jnp.arcsin(-clamp(m31))
        ok = jnp.abs(m31) < _GIMBAL_EPS
        x = jnp.where(ok, jnp.arctan2(m32, m33), zero)
        z = jnp.where(ok, jnp.arctan2(m21, m11), jnp.arctan2(-m12, m22))
    elif order == EulerOrder.YZX:
        z = jnp.arcsin(clamp(m21))
        ok = jnp.abs(m21) < _GIMBAL_EPS
        x = jnp.where(ok, jnp.arctan2(-m23, m22), zero)
        y = jnp.where(ok, jnp.arctan2(-m31, m11), jnp.arctan2(m13, m33))
    elif order == EulerOrder.XZY:
        z = jnp.arcsin(-clamp(m12))
        ok = jnp.abs(m12) < _GIMBAL_EPS
        x = jnp.where(ok, jnp.arctan2(m32, m22), jnp.arctan2(-m23, m33))
        y = jnp.where(ok, jnp.arctan2(m13, m11), zero)
    else:  # pragma: no cover
        raise ValueError(f"unknown euler order {order}")
    return jnp.stack([x, y, z], axis=-1)
