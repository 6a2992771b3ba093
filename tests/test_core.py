"""Tests for core: serializer text parity, EXIF payload round-trip, rig."""

import math
import os

import numpy as np
import pytest

from image_stitching_tpu.core import exif, image_io, persistence, rig
from image_stitching_tpu.geometry.camera import Cameras


# ---------------------------------------------------------- persistence ----
def test_serialize_matrix_format():
    m = np.array([[1.5, 2.0], [3.25, -4.0]], np.float32)
    assert persistence.serialize_matrix(m) == "[1.5,2;3.25,-4;]"
    back = persistence.deserialize_matrix("[1.5,2;3.25,-4;]")
    np.testing.assert_allclose(back, m)
    assert back.dtype == np.float32


def test_serialize_matrix_column_vector():
    t = np.array([[1.0], [2.0], [3.0]], np.float32)
    assert persistence.serialize_matrix(t) == "[1;2;3;]"
    back = persistence.deserialize_matrix("[1;2;3;]")
    assert back.shape == (3, 1)


def test_parse_matrix_str_square():
    m = persistence.parse_matrix_str("[1,2,3,4,5,6,7,8,9]")
    assert m.shape == (3, 3)
    np.testing.assert_allclose(m, np.arange(1, 10).reshape(3, 3))
    m4 = persistence.parse_matrix_str("[" + ",".join(map(str, range(16))) + "]")
    assert m4.shape == (4, 4)


def test_camera_params_roundtrip(tmp_path, rng):
    n = 5
    from scipy.spatial.transform import Rotation as R
    cams = Cameras(
        focal=rng.uniform(500, 1500, n).astype(np.float32),
        aspect=np.ones(n, np.float32),
        ppx=rng.uniform(100, 500, n).astype(np.float32),
        ppy=rng.uniform(100, 500, n).astype(np.float32),
        R=R.random(n, random_state=rng).as_matrix().astype(np.float32),
        t=rng.normal(size=(n, 3)).astype(np.float32),
    )
    persistence.serialize_camera_params(cams, str(tmp_path))
    back = persistence.deserialize_camera_params(str(tmp_path))
    # 6-significant-digit text; compare loosely.
    np.testing.assert_allclose(back.focal, np.asarray(cams.focal), rtol=1e-5)
    np.testing.assert_allclose(back.R, np.asarray(cams.R), atol=1e-5)
    np.testing.assert_allclose(back.t, np.asarray(cams.t), atol=1e-5)
    # Format spot-check: one line, 6 fields split by @.
    line = open(tmp_path / "cams.data").readline().strip()
    assert len(line.split("@")) == 6


def test_indices_roundtrip(tmp_path):
    persistence.serialize_indices([0, 3, 5, 36], str(tmp_path))
    assert persistence.deserialize_indices(str(tmp_path)) == [0, 3, 5, 36]
    content = open(tmp_path / "indices.data").read()
    assert content == "0\n3\n5\n36\n"


# ------------------------------------------------------------------ exif ----
@pytest.mark.parametrize("is_portrait", [False, True])
def test_exif_payload_roundtrip(is_portrait, rng):
    from scipy.spatial.transform import Rotation as R
    R_target = R.random(random_state=rng).as_matrix()
    payload = exif.camera_to_image_description(
        focal=1000.0, ppx=320.0, ppy=240.0, R=R_target,
        is_portrait=is_portrait, compass_angle=12.5)
    prior = exif.parse_image_description(payload)
    assert prior.is_portrait == is_portrait
    assert prior.compass_angle == 12.5
    focal, aspect, ppx, ppy, R_out, t = exif.sensor_prior_to_camera(prior)
    assert focal == 1000.0 and aspect == 1.0
    assert (ppx, ppy) == (320.0, 240.0)
    np.testing.assert_allclose(R_out, R_target, atol=1e-5)


def test_exif_jpeg_file_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation as R
    R_target = R.random(random_state=rng).as_matrix()
    payload = exif.camera_to_image_description(800.0, 100.0, 50.0, R_target)
    img = (rng.uniform(0, 255, (32, 48, 3))).astype(np.uint8)
    path = str(tmp_path / "0.jpg")
    image_io.write_jpeg_with_description(path, img, payload)
    back = exif.read_image_description(path)
    assert back is not None
    prior = exif.parse_image_description(back)
    focal, _, _, _, R_out, _ = exif.sensor_prior_to_camera(prior)
    assert focal == 800.0
    np.testing.assert_allclose(R_out, R_target, atol=1e-5)


# ------------------------------------------------------------------- rig ----
def test_rig_group_mapping():
    r = rig.DEFAULT_RIG
    assert r.total_images == 37
    # Ring boundaries: 11, 9, 4, 9, 4.
    assert r.group_of(0) == 0 and r.group_of(10) == 0
    assert r.group_of(11) == 1 and r.group_of(19) == 1
    assert r.group_of(20) == 2 and r.group_of(23) == 2
    assert r.group_of(24) == 3 and r.group_of(32) == 3
    assert r.group_of(33) == 4 and r.group_of(36) == 4
    assert r.group_start_end(1) == (11, 19)
    assert r.group_index(13, 1) == 2


def test_rig_rotation_priors():
    r = rig.DEFAULT_RIG
    # Ring 0: uniform 360/11 + 1.0deg error, startY 0.
    pitch, yaw, roll = r.rotation_prior(2)
    assert pitch == 0.0 and roll == 0.0
    assert yaw == pytest.approx(math.radians(2 * (360.0 / 11 + 1.0)))
    # Ring 1: explicit table + idx*error + startY 4.1.
    pitch, yaw, roll = r.rotation_prior(11 + 2)
    assert pitch == pytest.approx(math.radians(34.0))
    assert yaw == pytest.approx(math.radians(2 * 1.2 + 75.8 + 4.1))
    # Wrap past 180: ring 1 idx 8 -> 8*1.2 + 315.8 + 4.1 = 329.5 -> -30.5.
    _, yaw, _ = r.rotation_prior(11 + 8)
    assert yaw == pytest.approx(math.radians(8 * 1.2 + 315.8 + 4.1 - 360.0))
    # Ring 2 has angles[1]=83 nonzero -> table mode, no error.
    pitch, yaw, _ = r.rotation_prior(20 + 1)
    assert pitch == pytest.approx(math.radians(72.0))
    assert yaw == pytest.approx(math.radians(83.0))


# ------------------------------------------------------------------- io ----
def test_list_images_numeric_sort(tmp_path):
    for name in ["10.jpg", "2.JPG", "1.png", "note.txt", "03.jpeg"]:
        (tmp_path / name).write_bytes(b"")
    got = [os.path.basename(p) for p in image_io.list_images(str(tmp_path))]
    assert got == ["1.png", "2.JPG", "03.jpeg", "10.jpg"]


def test_rotations():
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    r90 = image_io.rotate_90_cw(img)
    assert r90.shape == (4, 2, 3)
    # Top-left of r90 = bottom-left of original.
    np.testing.assert_array_equal(r90[0, 0], img[-1, 0])
    r180 = image_io.rotate_180(img)
    np.testing.assert_array_equal(r180[0, 0], img[-1, -1])


def test_probe_oriented_size(tmp_path):
    from image_stitching_tpu.core.image_io import (imwrite,
                                                   probe_oriented_size)
    p = str(tmp_path / "img.jpg")
    imwrite(p, np.zeros((48, 64, 3), np.uint8))
    assert probe_oriented_size(p, is_portrait=False) == (64, 48)
    assert probe_oriented_size(p, is_portrait=True) == (48, 64)


def test_fetch_tree_roundtrip():
    """fetch_tree: one packed d->h transfer must reproduce every leaf with
    original dtype/shape; host numpy leaves pass through untouched."""
    import jax.numpy as jnp
    from image_stitching_tpu.core.transfer import fetch_tree

    rng = np.random.default_rng(0)
    f32 = rng.normal(size=(3, 5, 2)).astype(np.float32)
    i32 = rng.integers(-1000, 1000, (7,), dtype=np.int32)
    u8 = rng.integers(0, 255, (4, 6), dtype=np.uint8)
    bl = rng.integers(0, 2, (9,)).astype(bool)
    host = np.arange(4.0)
    tree = {"a": jnp.asarray(f32), "b": (jnp.asarray(i32), jnp.asarray(u8)),
            "c": jnp.asarray(bl), "host": host}
    out = fetch_tree(tree)
    assert isinstance(out["a"], np.ndarray) and out["a"].dtype == np.float32
    np.testing.assert_array_equal(out["a"], f32)
    np.testing.assert_array_equal(out["b"][0], i32)
    np.testing.assert_array_equal(out["b"][1], u8)
    assert out["c"].dtype == np.bool_
    np.testing.assert_array_equal(out["c"], bl)
    assert out["host"] is host
    # All-host tree returns unchanged.
    t2 = {"x": host}
    assert fetch_tree(t2)["x"] is host


def test_pack_mask_bits_roundtrip():
    import jax.numpy as jnp
    from image_stitching_tpu.core.transfer import (pack_mask_bits,
                                                   unpack_mask_bits)
    rng = np.random.default_rng(3)
    for w in (8, 13, 64, 129):
        m = (rng.integers(0, 2, (3, 5, w)) * 255).astype(np.uint8)
        bits = np.asarray(pack_mask_bits(jnp.asarray(m)))
        assert bits.shape == (3, 5, -(-w // 8))
        np.testing.assert_array_equal(unpack_mask_bits(bits, w), m)
