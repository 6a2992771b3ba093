"""Rotation utilities: Rodrigues vectors, axis helpers, orthonormalization.

The reference reaches these capabilities through OpenCV (``cv::Rodrigues``
inside ``cv::detail::BundleAdjusterReproj``, motion_estimators); here they are
pure JAX functions usable inside jit/vmap/grad (bundle adjustment
differentiates through ``rodrigues_to_matrix``).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "rodrigues_to_matrix",
    "matrix_to_rodrigues",
    "rad_to_deg",
    "deg_to_rad",
    "orthonormalize",
]


def rad_to_deg(rad):
    """`image_stitching.cpp:126-130`."""
    return rad / jnp.pi * 180.0


def deg_to_rad(deg):
    """`image_stitching.cpp:132-136`."""
    return deg / 180.0 * jnp.pi


def rodrigues_to_matrix(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle ``(..., 3)`` -> rotation matrix ``(..., 3, 3)``.

    Taylor-safe near theta=0 so it is differentiable everywhere (needed by
    the bundle adjuster's Jacobians).
    """
    rvec = jnp.asarray(rvec)
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-30))
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks near zero.
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    x, y, z = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def matrix_to_rodrigues(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix ``(..., 3, 3)`` -> axis-angle ``(..., 3)``.

    Handles the theta ~ 0 and theta ~ pi regimes branchlessly.
    """
    m = jnp.asarray(m)
    trace = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Antisymmetric part gives axis*sin(theta).
    ax = m[..., 2, 1] - m[..., 1, 2]
    ay = m[..., 0, 2] - m[..., 2, 0]
    az = m[..., 1, 0] - m[..., 0, 1]
    axis_sin = jnp.stack([ax, ay, az], axis=-1) * 0.5
    sin_t = jnp.sqrt(jnp.sum(axis_sin * axis_sin, axis=-1))
    # atan2(|axis_sin|, cos) is well-conditioned everywhere, unlike
    # arccos(cos_t) whose error blows up as theta -> pi.
    theta = jnp.arctan2(sin_t, cos_t)

    # Generic: r = theta/sin(theta) * axis_sin ; near 0: theta/sin ~ 1+t^2/6.
    scale = jnp.where(sin_t[..., None] > 1e-6,
                      theta[..., None] / jnp.maximum(sin_t[..., None], 1e-30),
                      1.0 + theta[..., None] ** 2 / 6.0)
    r_generic = axis_sin * scale

    # Large-angle branch: |axis_i| is exact from the diagonal for any theta
    # (m_ii = cos + axis_i^2 (1-cos)); signs from axis_sin when resolvable,
    # else from the symmetric off-diagonal products (2 a_i a_j (1-cos)).
    diag = jnp.stack([m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag - cos_t[..., None]) /
                          jnp.maximum(1.0 - cos_t[..., None], 1e-30), 0.0)
    axis_abs = jnp.sqrt(axis_sq)
    sx = jnp.ones_like(axis_abs[..., 0])
    sy = jnp.where(m[..., 0, 1] + m[..., 1, 0] < 0, -1.0, 1.0)
    sz = jnp.where(m[..., 0, 2] + m[..., 2, 0] < 0, -1.0, 1.0)
    sz = jnp.where(axis_abs[..., 0] < 1e-3,
                   jnp.where(m[..., 1, 2] + m[..., 2, 1] < 0, -1.0, 1.0) * sy,
                   sz)
    sign_prod = jnp.stack([sx, sy, sz], axis=-1)
    sign_asin = jnp.where(axis_sin >= 0, 1.0, -1.0)
    resolvable = jnp.abs(axis_sin) > 1e-5
    sign = jnp.where(resolvable, sign_asin, sign_prod)
    # If signs came from products, the overall sign is ambiguous (r ~ -r at
    # pi); that ambiguity is only hit within ~1e-5 of exactly pi.
    r_pi = axis_abs * sign * theta[..., None]

    near_pi = (cos_t < -0.9)[..., None]
    return jnp.where(near_pi, r_pi, r_generic)


def orthonormalize(m: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation matrix to SO(3) via SVD (det +1 enforced)."""
    u, _, vt = jnp.linalg.svd(m)
    d = jnp.linalg.det(u @ vt)
    fix = jnp.ones(m.shape[:-2] + (3,), dtype=m.dtype).at[..., 2].set(d)
    return (u * fix[..., None, :]) @ vt
