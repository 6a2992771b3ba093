"""Tests for the C++ host runtime (skipped when the .so isn't built)."""

import os

import numpy as np
import pytest
from PIL import Image

from image_stitching_tpu.core import exif, image_io, native
from image_stitching_tpu.estimation.components import biggest_component

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def test_jpeg_roundtrip_with_exif(tmp_path, rng):
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    p = str(tmp_path / "0.jpg")
    payload = "0;1.5;[1.0];[1.0];[1.0];[1.0]"
    assert native.write_jpeg(p, img, 95, payload)
    # Native decode == PIL decode (same libjpeg family).
    mine = native.read_image(p)
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(mine, ref)
    # EXIF payload visible to BOTH parsers.
    assert native.exif_description(p) == payload
    # Force the pure-Python parser for cross-validation.
    from image_stitching_tpu.core.exif import _parse_tiff_image_description
    with open(p, "rb") as f:
        data = f.read()
    i = data.find(b"Exif\x00\x00")
    assert i > 0
    size = int.from_bytes(data[i - 2:i], "big")
    assert _parse_tiff_image_description(
        data[i + 6:i + 4 + size]) == payload


def test_png_decode_exact(tmp_path, rng):
    img = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
    p = str(tmp_path / "1.png")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(native.read_image(p), img)


def test_batch_read_threaded(tmp_path, rng):
    paths = []
    imgs = []
    for i in range(5):
        img = rng.integers(0, 255, (32 + i, 48, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
        imgs.append(img)
    out = native.read_images(paths, nthreads=3)
    for a, b in zip(out, imgs):
        np.testing.assert_array_equal(a, b)


def test_components_matches_python(rng):
    n = 12
    conf = np.zeros((n, n))
    for (i, j) in [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7), (9, 10)]:
        conf[i, j] = conf[j, i] = 1.0
    kept_native = native.biggest_component(conf, 0.95)
    # Pure python reference.
    from image_stitching_tpu.estimation.components import DisjointSets
    ds = DisjointSets(n)
    for i in range(n):
        for j in range(n):
            if i != j and conf[i, j] >= 0.95:
                ds.merge(i, j)
    roots = [ds.find(i) for i in range(n)]
    sizes = {}
    for r in roots:
        sizes[r] = sizes.get(r, 0) + 1
    best = max(sizes, key=lambda r: (sizes[r], -r))
    kept_py = [i for i in range(n) if roots[i] == best]
    assert kept_native == kept_py


def test_edt_matches_scipy(rng):
    from scipy import ndimage
    m = (rng.uniform(size=(50, 70)) > 0.3).astype(np.uint8)
    m[0, 0] = 0  # ensure a zero exists
    ours = native.edt_sq(m)
    ref = ndimage.distance_transform_edt(m) ** 2
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_dp_seam_is_optimal_on_simple_grid():
    # A zero-cost column at x=7 in a field of ones: the seam must follow it.
    cost = np.ones((20, 15), np.float32)
    cost[:, 7] = 0.0
    cols = native.dp_seam(cost)
    assert (cols == 7).all()
    # Connectivity constraint.
    rng = np.random.default_rng(0)
    cost = rng.uniform(0, 1, (30, 25)).astype(np.float32)
    cols = native.dp_seam(cost)
    assert np.abs(np.diff(cols)).max() <= 1


def test_imread_dispatch_uses_native(tmp_path, rng):
    img = rng.integers(0, 255, (24, 36, 3), dtype=np.uint8)
    p = str(tmp_path / "2.png")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(image_io.imread(p), img)
    out = image_io.imread_batch([p, p])
    assert len(out) == 2


def test_read_image_opts_gray_and_scaled(tmp_path, rng):
    img = rng.integers(0, 255, (120, 200, 3), dtype=np.uint8)
    p = str(tmp_path / "1.jpg")
    Image.fromarray(img).save(p, quality=95)
    full = native.read_image(p)
    g = native.read_image_opts(p, gray=True, num8=8)
    assert g.shape == (120, 200)
    # JPEG luma == BT.601 gray of the RGB decode (rounding only).
    ref = (0.299 * full[..., 0] + 0.587 * full[..., 1] +
           0.114 * full[..., 2])
    assert np.abs(g.astype(np.float64) - ref).mean() < 1.0
    # DCT-scaled decode: dims are ceil(dim*num8/8); content is a proper
    # low-pass of the full image.
    q = native.read_image_opts(p, gray=False, num8=2)
    assert q.shape == (30, 50, 3)
    coarse = full.reshape(30, 4, 50, 4, 3).mean((1, 3))
    assert np.abs(q.astype(np.float64) - coarse).mean() < 12.0
    # Fractional eighth (libjpeg-turbo M/8 scaling): 5/8 of 120x200 is
    # ceil-scaled to 75x125, content a low-pass of the full image.
    q5 = native.read_image_opts(p, gray=False, num8=5)
    assert q5.shape == (75, 125, 3)
    from PIL import Image as _Image
    ref5 = np.asarray(_Image.fromarray(full).resize(
        (125, 75), _Image.BILINEAR), np.float64)
    # Random-noise content: DCT M/8 and bilinear low-passes differ per
    # pixel, but must be strongly correlated and mean-preserving.
    a, b = q5.astype(np.float64).ravel(), ref5.ravel()
    assert abs(a.mean() - b.mean()) < 2.0
    assert np.corrcoef(a, b)[0, 1] > 0.85
    from image_stitching_tpu.pipeline.ingest import pick_num8
    assert [pick_num8(s) for s in (1.0, 0.9, 0.625, 0.61, 0.5, 0.1,
                                   0.01)] == [8, 8, 5, 5, 4, 1, 1]


def test_decode_session_orders_and_matches(tmp_path, rng):
    paths = []
    imgs = []
    for i in range(4):
        img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
        imgs.append(img)
    items = []
    for p in paths:
        items.append((p, True, 8))
        items.append((p, False, 4))
    s = native.DecodeSession(items, nthreads=2)
    for i, p in enumerate(paths):
        g = s.wait(2 * i)
        q = s.wait(2 * i + 1)
        assert np.array_equal(g, native.read_image_opts(p, gray=True))
        assert np.array_equal(q, native.read_image_opts(p, num8=4))
    s.finish()


def test_raw_yuv420_decode_bit_exact(tmp_path, rng):
    """Raw 4:2:0 plane decode + device-side fancy upsample / fixed-point
    YCbCr->RGB must be BIT-EXACT vs libjpeg's own RGB pipeline — odd
    dims exercise the iMCU padding and edge-clamp special cases."""
    import jax.numpy as jnp
    from image_stitching_tpu.pipeline.ingest import yuv420_to_rgb_exact
    for hw in ((61, 77), (64, 96), (49, 129)):
        img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        p = str(tmp_path / f"raw_{hw[0]}x{hw[1]}.jpg")
        Image.fromarray(img).save(p, quality=92)
        probe = native.probe_jpeg_sampling(p)
        assert probe is not None and probe[2], probe
        ref = native.read_image(p)
        buf, w, h = native.read_jpeg_yuv420(p)
        assert (w, h) == (hw[1], hw[0])
        ya_w, ya_h, ca_w, ca_h = native.yuv420_layout(w, h)
        y_sz, c_sz = ya_w * ya_h, ca_w * ca_h
        y = buf[:y_sz].reshape(ya_h, ya_w)[:h, :w]
        cb = buf[y_sz:y_sz + c_sz].reshape(
            ca_h, ca_w)[:(h + 1) // 2, :(w + 1) // 2]
        cr = buf[y_sz + c_sz:].reshape(
            ca_h, ca_w)[:(h + 1) // 2, :(w + 1) // 2]
        got = np.asarray(yuv420_to_rgb_exact(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)))
        assert np.array_equal(got, ref), \
            (hw, int(np.abs(got.astype(int) - ref.astype(int)).max()))
    # DecodeSession raw items produce the same packed planes (compare
    # valid regions only: iMCU padding columns beyond width_in_blocks*8
    # are uninitialized).
    s = native.DecodeSession([(p, False, 8, True)], nthreads=1)
    buf2 = s.wait(0)
    for off, sz, pw, ph, vw, vh in (
            (0, y_sz, ya_w, ya_h, w, h),
            (y_sz, c_sz, ca_w, ca_h, (w + 1) // 2, (h + 1) // 2),
            (y_sz + c_sz, c_sz, ca_w, ca_h, (w + 1) // 2, (h + 1) // 2)):
        a = buf[off:off + sz].reshape(ph, pw)[:vh, :vw]
        b = buf2[off:off + sz].reshape(ph, pw)[:vh, :vw]
        assert np.array_equal(a, b)
    s.finish()


def test_raw_yuv420_scaled_decode(tmp_path, rng):
    """DCT-scaled raw 4:2:0 decode (one entropy pass per file): the Y
    plane must be BIT-EXACT vs the dedicated luma-only decode at the same
    num8 (the detection path), and the device RGB reconstruction must
    stay within a small tolerance of libjpeg's own scaled RGB decode
    (chroma is IDCT-upsampled by libjpeg at num8<8, box-resampled to
    4:2:0 on the worker thread, fancy-upsampled back on device)."""
    import jax.numpy as jnp
    from image_stitching_tpu.pipeline.ingest import yuv420_to_rgb_exact
    for hw, num8 in (((61, 77), 4), ((64, 96), 6), ((49, 129), 2),
                     ((80, 112), 5)):
        # Smooth content + structure: box-resampled chroma error is
        # content-dependent; keep the oracle gap tight but honest.
        base = rng.integers(0, 255, (8, 10, 3)).astype(np.uint8)
        img = np.asarray(Image.fromarray(base).resize(
            (hw[1], hw[0]), Image.BILINEAR), np.float32)
        img = np.clip(img + rng.normal(0, 4, (*hw, 3)),
                      0, 255).astype(np.uint8)
        p = str(tmp_path / f"sr_{hw[0]}x{hw[1]}_{num8}.jpg")
        Image.fromarray(img).save(p, quality=92)
        got = native.read_jpeg_yuv420(p, num8)
        assert got is not None
        buf, w, h = got
        assert (w, h) == native.scaled_dims(hw[1], hw[0], num8)
        ya_w, ya_h, ca_w, ca_h = native.yuv420_layout(hw[1], hw[0], num8)
        y_sz, c_sz = ya_w * ya_h, ca_w * ca_h
        y = buf[:y_sz].reshape(ya_h, ya_w)[:h, :w]
        cb = buf[y_sz:y_sz + c_sz].reshape(
            ca_h, ca_w)[:(h + 1) // 2, :(w + 1) // 2]
        cr = buf[y_sz + c_sz:].reshape(
            ca_h, ca_w)[:(h + 1) // 2, :(w + 1) // 2]
        gray_ref = native.read_image_opts(p, gray=True, num8=num8)
        assert np.array_equal(y, gray_ref), (hw, num8)
        rgb_dev = np.asarray(yuv420_to_rgb_exact(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr))).astype(
                np.float32)
        # RGB criterion: both our reconstruction and libjpeg's own scaled
        # RGB decode are approximations of the TRUE reference path
        # (full-res decode -> resize, image_stitching.cpp:602); ours must
        # not be meaningfully worse an approximation than libjpeg's.
        from image_stitching_tpu.ops.imgproc import resize
        rgb_scaled = native.read_image_opts(
            p, gray=False, num8=num8).astype(np.float32)
        full = native.read_image(p).astype(np.float32)
        gt = np.asarray(resize(jnp.asarray(full), (h, w)))
        e_ours = float(np.abs(rgb_dev - gt).mean())
        e_libjpeg = float(np.abs(rgb_scaled - gt).mean())
        assert e_ours <= 1.35 * e_libjpeg + 1.0, (hw, num8, e_ours,
                                                  e_libjpeg)
        # DecodeSession raw item at the same scale -> same packed planes.
        s = native.DecodeSession([(p, False, num8, True)], nthreads=1)
        buf2 = s.wait(0)
        assert np.array_equal(buf[:y_sz].reshape(ya_h, ya_w)[:h, :w],
                              buf2[:y_sz].reshape(ya_h, ya_w)[:h, :w])
        s.finish()


def test_decode_session_delta_encode_roundtrip(tmp_path, rng):
    """Native delta_rows == numpy wrapping row-diff; exact mod-256
    inversion with a u8 prefix sum (the device-side decode)."""
    from image_stitching_tpu.pipeline.ingest import _row_delta
    img = rng.integers(0, 255, (45, 70, 3), dtype=np.uint8)
    p = str(tmp_path / "d.jpg")
    Image.fromarray(img).save(p, quality=95)
    items = [(p, True, 8), (p, False, 8)]
    plain = native.DecodeSession(items, nthreads=1)
    ref_g, ref_c = plain.wait(0).copy(), plain.wait(1).copy()
    plain.finish()
    enc = native.DecodeSession(items, nthreads=1, delta=True)
    got_g, got_c = enc.wait(0), enc.wait(1)
    assert np.array_equal(got_g, _row_delta(ref_g))
    assert np.array_equal(got_c, _row_delta(ref_c))
    # invert: wrapping cumulative sum along the row axis
    for got, ref in ((got_g, ref_g), (got_c, ref_c)):
        dec = np.cumsum(got.astype(np.uint64), axis=1).astype(np.uint8)
        assert np.array_equal(dec, ref)
