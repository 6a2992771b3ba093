"""Unit tests for the geometry layer.

Strategy per SURVEY.md section 4(a): quaternion/euler round-trips across all
six orders (incl. gimbal-lock cases), cross-checked against
scipy.spatial.transform.Rotation as an independent oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from image_stitching_tpu.geometry import (
    ALL_ORDERS, EulerOrder, Cameras, euler_to_rotation_matrix, get_fov,
    matrix_to_rodrigues, quaternion as quat, rodrigues_to_matrix,
    rotation_matrix_to_euler,
)

jax.config.update("jax_enable_x64", False)


def random_rotations(rng, n):
    return ScipyRot.random(n, random_state=rng).as_matrix().astype(np.float32)


# ---------------------------------------------------------------- euler ----
@pytest.mark.parametrize("order", ALL_ORDERS)
def test_euler_matrix_roundtrip(order, rng):
    angles = rng.uniform(-1.2, 1.2, size=(64, 3)).astype(np.float32)
    m = euler_to_rotation_matrix(angles, order)
    back = rotation_matrix_to_euler(m, order)
    m2 = euler_to_rotation_matrix(back, order)
    # Angles may alias; matrices must match.
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=2e-5)


@pytest.mark.parametrize("order", ALL_ORDERS)
def test_euler_matches_scipy(order, rng):
    # three.js 'XYZ' = intrinsic Rx@Ry@Rz applied... equivalent to scipy
    # extrinsic lowercase reversed-order composition of the same matrices.
    angles = rng.uniform(-1.2, 1.2, size=(16, 3)).astype(np.float64)
    m = np.asarray(euler_to_rotation_matrix(angles, order))
    seq = order.value  # e.g. "XYZ"
    idx = {"X": 0, "Y": 1, "Z": 2}
    per_axis = angles[:, [idx[c] for c in seq]]
    m_ref = ScipyRot.from_euler(seq, per_axis).as_matrix()
    np.testing.assert_allclose(m, m_ref, atol=1e-5)


@pytest.mark.parametrize("order", ALL_ORDERS)
def test_euler_gimbal_lock(order):
    # Middle-axis rotation at +-pi/2 triggers the 0.9999999 guard.
    for sign in (+1.0, -1.0):
        angles = np.zeros((3,), np.float32)
        mid_axis = order.value[1]
        angles[{"X": 0, "Y": 1, "Z": 2}[mid_axis]] = sign * np.pi / 2
        angles[{"X": 0, "Y": 1, "Z": 2}[order.value[0]]] = 0.3
        m = euler_to_rotation_matrix(angles, order)
        back = rotation_matrix_to_euler(m, order)
        m2 = euler_to_rotation_matrix(back, order)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)


# ----------------------------------------------------------- quaternion ----
def test_quaternion_matrix_roundtrip(rng):
    m = random_rotations(rng, 128)
    q = quat.from_rotation_matrix(m)
    m2 = quat.to_rotation_matrix(q)
    np.testing.assert_allclose(np.asarray(m2), m, atol=1e-5)
    # Unit norm.
    np.testing.assert_allclose(np.asarray(quat.norm(q)), 1.0, atol=1e-5)


def test_quaternion_matches_scipy(rng):
    m = random_rotations(rng, 32)
    q = np.asarray(quat.from_rotation_matrix(m))
    q_ref = ScipyRot.from_matrix(m).as_quat()  # scipy is [x,y,z,w] too
    # Sign ambiguity: compare up to sign.
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, q_ref * sign, atol=1e-5)


@pytest.mark.parametrize("order", ALL_ORDERS)
def test_quaternion_from_euler(order, rng):
    angles = rng.uniform(-1.2, 1.2, size=(16, 3)).astype(np.float32)
    q = quat.from_euler(angles, order)
    m_from_q = quat.to_rotation_matrix(q)
    m_direct = euler_to_rotation_matrix(angles, order)
    np.testing.assert_allclose(np.asarray(m_from_q), np.asarray(m_direct),
                               atol=1e-5)


def test_quaternion_multiply_compose(rng):
    ma, mb = random_rotations(rng, 8), random_rotations(rng, 8)
    qa, qb = quat.from_rotation_matrix(ma), quat.from_rotation_matrix(mb)
    q_ab = quat.multiply(qa, qb)
    np.testing.assert_allclose(np.asarray(quat.to_rotation_matrix(q_ab)),
                               ma @ mb, atol=1e-5)


def test_quaternion_conjugate_invert(rng):
    m = random_rotations(rng, 8)
    q = quat.from_rotation_matrix(m)
    qi = quat.invert(q)
    prod = quat.multiply(q, qi)
    ident = np.tile([0, 0, 0, 1.0], (8, 1))
    sign = np.sign(np.asarray(prod[..., 3:4]))
    np.testing.assert_allclose(np.asarray(prod) * sign, ident, atol=1e-5)


def test_quaternion_apply_to_vector(rng):
    m = random_rotations(rng, 8)
    q = quat.from_rotation_matrix(m)
    v = rng.normal(size=(8, 3)).astype(np.float32)
    rotated = quat.apply_to_vector(q, v)
    expected = np.einsum("nij,nj->ni", m, v)
    np.testing.assert_allclose(np.asarray(rotated), expected, atol=1e-4)


def test_slerp_endpoints_and_midpoint(rng):
    ma, mb = random_rotations(rng, 4), random_rotations(rng, 4)
    qa, qb = quat.from_rotation_matrix(ma), quat.from_rotation_matrix(mb)
    np.testing.assert_allclose(np.asarray(quat.slerp(qa, qb, 0.0)),
                               np.asarray(qa), atol=1e-5)
    # t=1 may differ by sign (shortest path flip) — compare as rotations.
    q1 = quat.slerp(qa, qb, 1.0)
    np.testing.assert_allclose(np.asarray(quat.to_rotation_matrix(q1)),
                               np.asarray(quat.to_rotation_matrix(qb)),
                               atol=1e-5)
    # Midpoint is equidistant.
    qm = quat.slerp(qa, qb, 0.5)
    np.testing.assert_allclose(np.asarray(quat.angle_to(qa, qm)),
                               np.asarray(quat.angle_to(qm, qb)), atol=1e-4)


def test_slerp_near_parallel(rng):
    m = random_rotations(rng, 4)
    q = quat.from_rotation_matrix(m)
    out = quat.slerp(q, q, 0.3)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-5)


def test_from_unit_vectors(rng):
    v_from = rng.normal(size=(16, 3))
    v_from /= np.linalg.norm(v_from, axis=-1, keepdims=True)
    v_to = rng.normal(size=(16, 3))
    v_to /= np.linalg.norm(v_to, axis=-1, keepdims=True)
    q = quat.from_unit_vectors(v_from.astype(np.float32),
                               v_to.astype(np.float32))
    rotated = quat.apply_to_vector(q, v_from.astype(np.float32))
    np.testing.assert_allclose(np.asarray(rotated), v_to, atol=1e-4)
    # Antiparallel case.
    q = quat.from_unit_vectors(np.float32([1, 0, 0]), np.float32([-1, 0, 0]))
    r = quat.apply_to_vector(q, np.float32([1, 0, 0]))
    np.testing.assert_allclose(np.asarray(r), [-1, 0, 0], atol=1e-5)


# ------------------------------------------------------------- rodrigues ----
def test_rodrigues_roundtrip(rng):
    rvec = rng.uniform(-2.0, 2.0, size=(64, 3)).astype(np.float32)
    m = rodrigues_to_matrix(rvec)
    back = matrix_to_rodrigues(m)
    m2 = rodrigues_to_matrix(back)
    # f32 conditioning degrades near theta ~ pi; 5e-4 on matrix entries
    # corresponds to <0.03deg of rotation error.
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=5e-4)


def test_rodrigues_matches_scipy(rng):
    rvec = rng.uniform(-2.0, 2.0, size=(16, 3))
    m = np.asarray(rodrigues_to_matrix(rvec.astype(np.float32)))
    m_ref = ScipyRot.from_rotvec(rvec).as_matrix()
    np.testing.assert_allclose(m, m_ref, atol=1e-5)


def test_rodrigues_small_and_pi():
    # Near zero.
    m = rodrigues_to_matrix(np.float32([1e-9, 0, 0]))
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-6)
    # Near pi.
    rv = np.float32([0, np.pi - 1e-4, 0])
    m = rodrigues_to_matrix(rv)
    back = matrix_to_rodrigues(m)
    m2 = rodrigues_to_matrix(back)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-3)


# --------------------------------------------------------------- cameras ----
def test_cameras_k_and_fov():
    cams = Cameras(
        focal=jnp.float32([100.0, 200.0]), aspect=jnp.float32([1.0, 2.0]),
        ppx=jnp.float32([50.0, 60.0]), ppy=jnp.float32([40.0, 30.0]),
        R=jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), t=jnp.zeros((2, 3)))
    k = np.asarray(cams.K())
    np.testing.assert_allclose(k[0], [[100, 0, 50], [0, 100, 40], [0, 0, 1]])
    np.testing.assert_allclose(k[1], [[200, 0, 60], [0, 400, 30], [0, 0, 1]])
    fx, fy = get_fov(cams)
    np.testing.assert_allclose(np.asarray(fx)[0], 2 * np.arctan(50 / 100),
                               atol=1e-6)
    sub = cams[0:1]
    assert len(sub) == 1
    scaled = cams.scaled(2.0)
    np.testing.assert_allclose(np.asarray(scaled.focal), [200.0, 400.0])
