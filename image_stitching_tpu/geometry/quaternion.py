"""Quaternion math as pure JAX functions.

TPU-native re-design of the reference's three.js-style quaternion class
(`/root/reference/image_stitching/quaternion.h:5-606`).  Instead of a mutable
class, quaternions are plain ``(..., 4)`` arrays laid out ``[x, y, z, w]``
(the reference's component order), and every operation is a pure, batched,
jit/vmap-compatible function.  All branchy logic (e.g. the Shepperd
matrix->quaternion extraction, slerp's small-angle fallback) is expressed
branchlessly with ``jnp.where`` so the functions trace to static XLA graphs.

Semantics parity map (reference -> here):
  quaternion.h:172-239  setFromEuler           -> from_euler
  quaternion.h:241-258  setFromAxisAngle       -> from_axis_angle
  quaternion.h:260-322  setFromRotationMatrix  -> from_rotation_matrix
  quaternion.h:324-363  setFromUnitVectors     -> from_unit_vectors
  quaternion.h:365-372  angleTo                -> angle_to
  quaternion.h:374-383  rotateTowards          -> rotate_towards
  quaternion.h:385-407  conjugate/invert       -> conjugate / invert
  quaternion.h:409-413  dot                    -> dot
  quaternion.h:415-452  length/normalize       -> norm / normalize
  quaternion.h:454-478  multiply/premultiply   -> multiply(a, b)
  quaternion.h:480-544  slerp                  -> slerp
  quaternion.h:564-596  toRotationMatrix       -> to_rotation_matrix
"""

from __future__ import annotations

import jax.numpy as jnp

from .euler_order import EulerOrder

__all__ = [
    "identity",
    "from_euler",
    "from_axis_angle",
    "from_rotation_matrix",
    "from_unit_vectors",
    "to_rotation_matrix",
    "multiply",
    "conjugate",
    "invert",
    "dot",
    "norm",
    "normalize",
    "angle_to",
    "rotate_towards",
    "slerp",
    "apply_to_vector",
]


def identity(dtype=jnp.float32) -> jnp.ndarray:
    """The identity quaternion [0, 0, 0, 1]."""
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def from_euler(euler: jnp.ndarray, order: EulerOrder) -> jnp.ndarray:
    """Quaternion from intrinsic Euler angles ``(..., 3)`` = [x, y, z] radians.

    Matches `quaternion.h:172-239` (a three.js port): the order string names
    the sequence of axis rotations composed left-to-right, e.g. ``XYZ`` means
    ``q = qx * qy * qz``.  `order` must be a static (non-traced) value.
    """
    euler = jnp.asarray(euler)
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    c1, s1 = jnp.cos(x * 0.5), jnp.sin(x * 0.5)
    c2, s2 = jnp.cos(y * 0.5), jnp.sin(y * 0.5)
    c3, s3 = jnp.cos(z * 0.5), jnp.sin(z * 0.5)

    order = EulerOrder(order)
    if order == EulerOrder.XYZ:
        qx = s1 * c2 * c3 + c1 * s2 * s3
        qy = c1 * s2 * c3 - s1 * c2 * s3
        qz = c1 * c2 * s3 + s1 * s2 * c3
        qw = c1 * c2 * c3 - s1 * s2 * s3
    elif order == EulerOrder.YXZ:
        qx = s1 * c2 * c3 + c1 * s2 * s3
        qy = c1 * s2 * c3 - s1 * c2 * s3
        qz = c1 * c2 * s3 - s1 * s2 * c3
        qw = c1 * c2 * c3 + s1 * s2 * s3
    elif order == EulerOrder.ZXY:
        qx = s1 * c2 * c3 - c1 * s2 * s3
        qy = c1 * s2 * c3 + s1 * c2 * s3
        qz = c1 * c2 * s3 + s1 * s2 * c3
        qw = c1 * c2 * c3 - s1 * s2 * s3
    elif order == EulerOrder.ZYX:
        qx = s1 * c2 * c3 - c1 * s2 * s3
        qy = c1 * s2 * c3 + s1 * c2 * s3
        qz = c1 * c2 * s3 - s1 * s2 * c3
        qw = c1 * c2 * c3 + s1 * s2 * s3
    elif order == EulerOrder.YZX:
        qx = s1 * c2 * c3 + c1 * s2 * s3
        qy = c1 * s2 * c3 + s1 * c2 * s3
        qz = c1 * c2 * s3 - s1 * s2 * c3
        qw = c1 * c2 * c3 - s1 * s2 * s3
    elif order == EulerOrder.XZY:
        qx = s1 * c2 * c3 - c1 * s2 * s3
        qy = c1 * s2 * c3 - s1 * c2 * s3
        qz = c1 * c2 * s3 + s1 * s2 * c3
        qw = c1 * c2 * c3 + s1 * s2 * s3
    else:  # pragma: no cover - exhaustive enum
        raise ValueError(f"unknown euler order {order}")
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from a (assumed normalized) axis and angle.

    Matches `quaternion.h:241-258`.
    """
    axis = jnp.asarray(axis)
    angle = jnp.asarray(angle)
    half = angle * 0.5
    s = jnp.sin(half)
    xyz = axis * s[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([xyz, w], axis=-1)


def from_rotation_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from a ``(..., 3, 3)`` rotation matrix (Shepperd's method).

    Branchless port of the trace-branching extraction at
    `quaternion.h:260-322`; all four branches are computed and the correct
    one selected with ``jnp.where`` so the function traces cleanly.
    """
    m = jnp.asarray(m)
    m11, m12, m13 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m21, m22, m23 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m31, m32, m33 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    trace = m11 + m22 + m33

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-30))

    # Branch 0: trace > 0
    s0 = 0.5 / safe_sqrt(trace + 1.0)
    q0 = jnp.stack([(m32 - m23) * s0, (m13 - m31) * s0, (m21 - m12) * s0,
                    0.25 / s0], axis=-1)
    # Branch 1: m11 largest
    s1 = 2.0 * safe_sqrt(1.0 + m11 - m22 - m33)
    q1 = jnp.stack([0.25 * s1, (m12 + m21) / s1, (m13 + m31) / s1,
                    (m32 - m23) / s1], axis=-1)
    # Branch 2: m22 largest
    s2 = 2.0 * safe_sqrt(1.0 + m22 - m11 - m33)
    q2 = jnp.stack([(m12 + m21) / s2, 0.25 * s2, (m23 + m32) / s2,
                    (m13 - m31) / s2], axis=-1)
    # Branch 3: m33 largest
    s3 = 2.0 * safe_sqrt(1.0 + m33 - m11 - m22)
    q3 = jnp.stack([(m13 + m31) / s3, (m23 + m32) / s3, 0.25 * s3,
                    (m21 - m12) / s3], axis=-1)

    use0 = (trace > 0.0)[..., None]
    use1 = ((m11 > m22) & (m11 > m33))[..., None]
    use2 = (m22 > m33)[..., None]
    return jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))


def from_unit_vectors(v_from: jnp.ndarray, v_to: jnp.ndarray) -> jnp.ndarray:
    """Shortest-arc quaternion rotating unit vector `v_from` onto `v_to`.

    Matches `quaternion.h:324-363` (with its antiparallel fallback done
    correctly -- the reference's version had JS-isms that never compiled).
    """
    v_from = jnp.asarray(v_from)
    v_to = jnp.asarray(v_to)
    r = jnp.sum(v_from * v_to, axis=-1) + 1.0
    cross = jnp.cross(v_from, v_to)
    # Regular case.
    q_reg = jnp.concatenate([cross, r[..., None]], axis=-1)
    # Antiparallel: rotate 180deg about any axis orthogonal to v_from.
    fx, fy, fz = v_from[..., 0], v_from[..., 1], v_from[..., 2]
    use_x = jnp.abs(fx) > jnp.abs(fz)
    ax = jnp.where(use_x, -fy, jnp.zeros_like(fx))
    ay = jnp.where(use_x, fx, -fz)
    az = jnp.where(use_x, jnp.zeros_like(fx), fy)
    q_anti = jnp.stack([ax, ay, az, jnp.zeros_like(fx)], axis=-1)
    q = jnp.where((r < 1e-8)[..., None], q_anti, q_reg)
    return normalize(q)


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """``(..., 4)`` quaternion -> ``(..., 3, 3)`` rotation matrix.

    Matches `quaternion.h:564-596`.
    """
    q = jnp.asarray(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, xy, xz = x * x2, x * y2, x * z2
    yy, yz, zz = y * y2, y * z2, z * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    row0 = jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1)
    row1 = jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1)
    row2 = jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``a * b`` (apply b's rotation, then a's).

    Matches `quaternion.h:454-478` / `multiplyQuaternionsFlat` (:119-145).
    """
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = ax * bw + aw * bx + ay * bz - az * by
    y = ay * bw + aw * by + az * bx - ax * bz
    z = az * bw + aw * bz + ax * by - ay * bx
    w = aw * bw - ax * bx - ay * by - az * bz
    return jnp.stack([x, y, z, w], axis=-1)


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Negate the vector part (`quaternion.h:394-407`)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def invert(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse; for unit quaternions this equals the conjugate
    (`quaternion.h:385-392`)."""
    return conjugate(q) / jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True),
                                      1e-30)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """4-component dot product (`quaternion.h:409-413`, fixed return type)."""
    return jnp.sum(a * b, axis=-1)


def norm(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(q * q, axis=-1))


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize, mapping zero-length input to identity
    (`quaternion.h:426-452`)."""
    n = norm(q)[..., None]
    safe = q / jnp.maximum(n, 1e-30)
    ident = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=q.dtype), q.shape)
    return jnp.where(n > 1e-30, safe, ident)


def angle_to(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle between rotations (`quaternion.h:365-372`)."""
    d = jnp.clip(jnp.abs(dot(a, b)), -1.0, 1.0)
    return 2.0 * jnp.arccos(d)


def rotate_towards(a: jnp.ndarray, b: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """Rotate `a` towards `b` by at most `step` radians
    (`quaternion.h:374-383`)."""
    angle = angle_to(a, b)
    t = jnp.where(angle == 0.0, jnp.ones_like(angle),
                  jnp.minimum(1.0, step / jnp.maximum(angle, 1e-30)))
    return slerp(a, b, t)


def slerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical linear interpolation (`quaternion.h:480-544`), branchless.

    Uses the same shortest-path sign flip and falls back to normalized
    lerp for nearly-parallel quaternions.
    """
    t = jnp.asarray(t)[..., None]
    cos_half = dot(a, b)[..., None]
    sign = jnp.where(cos_half < 0.0, -1.0, 1.0)
    b = b * sign
    cos_half = jnp.abs(cos_half)
    cos_half = jnp.clip(cos_half, -1.0, 1.0)

    sin_half_sq = 1.0 - cos_half * cos_half
    half = jnp.arccos(cos_half)
    sin_half = jnp.sqrt(jnp.maximum(sin_half_sq, 1e-30))
    ratio_a = jnp.sin((1.0 - t) * half) / sin_half
    ratio_b = jnp.sin(t * half) / sin_half
    q_slerp = a * ratio_a + b * ratio_b
    # Near-parallel fallback: nlerp (matches the s<=EPS branch :519-531).
    q_lerp = normalize(a * (1.0 - t) + b * t)
    return jnp.where(sin_half_sq <= 1e-12, q_lerp, q_slerp)


def apply_to_vector(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v`` by quaternion ``q`` (q * v * q^-1)."""
    qvec = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (w * uv + uuv)
