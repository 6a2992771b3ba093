"""Tiled banded-pyramid parity: the >_T_DENSE path must equal the dense
matrices (which tests/test_ops.py pins against cv2 pyrDown/pyrUp)."""
import jax.numpy as jnp
import numpy as np

from image_stitching_tpu.ops import pyr_mat as pm


def _dense_down(x):
    dh, dw = pm.down_mats(x.shape[-2], x.shape[-1])
    return jnp.einsum("oh,...hw,pw->...op", dh, x, dw)


def _dense_up(x, out_hw):
    uh, uw = pm.up_mats(out_hw[0], out_hw[1], x.shape[-2], x.shape[-1])
    return jnp.einsum("oh,...hw,pw->...op", uh, x, uw)


def test_tiled_down_matches_dense():
    rng = np.random.default_rng(0)
    # 4201 > _T_DENSE triggers the tiled path on the wide axis (odd on
    # purpose: exercises the ceil half-size and window zero-padding).
    x = jnp.asarray(rng.uniform(-5, 5, (2, 129, 4201)).astype(np.float32))
    got = pm.pyr_down_mm(x)
    want = _dense_down(x)
    assert got.shape == want.shape == (2, 65, 2101)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_tiled_up_matches_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-5, 5, (2, 65, 2101)).astype(np.float32))
    out_hw = (129, 4201)
    got = pm.pyr_up_mm(x, out_hw)
    want = _dense_up(x, out_hw)
    assert got.shape == want.shape == (2, 129, 4201)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_tiled_roundtrip_both_axes_large():
    """Both axes above the dense threshold (the mosaic-canvas shape class
    that overflowed the remote-compile request with dense constants)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 255, (4224, 4352)).astype(np.float32))
    d = pm.pyr_down_mm(x)
    assert d.shape == (2112, 2176)
    u = pm.pyr_up_mm(d, (4224, 4352))
    # Down->up is a smoother, not identity: just sanity-check range/finite.
    assert np.isfinite(np.asarray(u)).all()
    assert 0 <= float(jnp.min(u)) + 60 and float(jnp.max(u)) <= 320
