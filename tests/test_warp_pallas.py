"""warp_bilinear_pallas (interpret mode) vs a plain bilinear gather.

The kernel covers the compose-path image sample
(`image_stitching.cpp:1154` remap role); correctness in production is
guarded by the lax.cond gather fallback, but the kernel itself must be
exact for admissible coordinate fields.  Runs the Pallas interpreter on
CPU — no TPU needed."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_stitching_tpu.kernels.warp_gather_pallas import (
    TH, TW, tile_spans_ok, warp_bilinear_pallas)


def _ref_bilinear(img, sx, sy):
    """Clamp-to-edge bilinear gather, (3, hc, wc) planar."""
    _, hc, wc = img.shape
    sx = np.clip(sx, 0.0, wc - 1.0)
    sy = np.clip(sy, 0.0, hc - 1.0)
    x0 = np.floor(sx).astype(np.int32)
    y0 = np.floor(sy).astype(np.int32)
    fx = sx - x0
    fy = sy - y0
    x1 = np.minimum(x0 + 1, wc - 1)
    y1 = np.minimum(y0 + 1, hc - 1)
    out = (img[:, y0, x0] * (1 - fx) * (1 - fy) +
           img[:, y0, x1] * fx * (1 - fy) +
           img[:, y1, x0] * (1 - fx) * fy +
           img[:, y1, x1] * fx * fy)
    return out


def _smooth_field(h, w, hc, wc, seed):
    """A smooth warp-like coordinate field admissible per tile_spans_ok."""
    rng = np.random.default_rng(seed)
    vv, uu = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = (uu * (wc - 1) / max(w - 1, 1) * 0.9 + 3.0 +
          2.0 * np.sin(vv / 37.0) + rng.uniform(-0.4, 0.4, (h, w)))
    sy = (vv * (hc - 1) / max(h - 1, 1) * 0.9 + 2.0 +
          1.5 * np.cos(uu / 53.0) + rng.uniform(-0.4, 0.4, (h, w)))
    return sx.astype(np.float32), sy.astype(np.float32)


@pytest.mark.parametrize("hc,wc,h,w", [
    (48, 200, 40, 256),      # tiny
    (96, 640, 64, 384),      # non-multiple output dims exercise padding
])
def test_kernel_matches_gather(hc, wc, h, w):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (3, hc, wc)).astype(np.float32)
    sx, sy = _smooth_field(h, w, hc, wc, seed=1)
    sx = np.clip(sx, 0.0, wc - 1.0)
    sy = np.clip(sy, 0.0, hc - 1.0)
    assert tile_spans_ok(sx, sy, wc, hc)
    out = np.asarray(warp_bilinear_pallas(
        jnp.asarray(img), jnp.asarray(sx), jnp.asarray(sy),
        interpret=True))
    ref = _ref_bilinear(img, sx, sy)
    assert out.shape == (3, h, w)
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-3)


def test_channels_independent():
    """The channel grid dim must not mix planes: a one-hot channel image
    warps to output that is nonzero only in that channel."""
    hc, wc, h, w = 48, 200, 16, 128
    rng = np.random.default_rng(2)
    sx, sy = _smooth_field(h, w, hc, wc, seed=3)
    sx = np.clip(sx, 0.0, wc - 1.0)
    sy = np.clip(sy, 0.0, hc - 1.0)
    for c in range(3):
        img = np.zeros((3, hc, wc), np.float32)
        img[c] = rng.uniform(1, 255, (hc, wc)).astype(np.float32)
        out = np.asarray(warp_bilinear_pallas(
            jnp.asarray(img), jnp.asarray(sx), jnp.asarray(sy),
            interpret=True))
        others = [i for i in range(3) if i != c]
        assert np.abs(out[others]).max() == 0.0
        assert np.abs(out[c]).max() > 0.0
