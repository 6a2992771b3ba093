"""Tests for the distributed layer on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from image_stitching_tpu.parallel import (make_batched_register, make_mesh,
                                          make_sharded_composite,
                                          make_sharded_multiband)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _scene(n=3, h=48, w=64, focal=40.0):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)
    ks = np.tile(np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                          np.float32), (n, 1, 1))
    rs = np.stack([R.from_euler("y", 0.5 * i).as_matrix().astype(np.float32)
                   for i in range(n)])
    return imgs, ks, rs


def test_sharded_composite_runs_and_is_sharded():
    mesh = make_mesh((2, 4), ("dp", "sp"))
    imgs, ks, rs = _scene()
    fn = make_sharded_composite(mesh, 3, (48, 64), (96, 256), (-128, 40),
                                40.0)
    out = fn(jnp.asarray(imgs), jnp.asarray(ks), jnp.asarray(rs))
    assert out.shape == (96, 256, 3)
    assert "sp" in str(out.sharding.spec)
    assert float(np.abs(np.asarray(out)).sum()) > 0


def test_sharded_multiband_matches_unsharded():
    # The margin-recompute scheme must yield the SAME canvas regardless of
    # the shard count (1 vs 4 devices).
    imgs, ks, rs = _scene(n=3, h=48, w=64)
    weights = np.ones((3, 48, 64), np.float32)
    canvas_hw = (96, 256)
    tl = (-128, 40)
    mesh4 = make_mesh((1, 4), ("dp", "sp"))
    mesh1 = make_mesh((1, 1), ("dp", "sp"))
    fn4 = make_sharded_multiband(mesh4, 3, (48, 64), canvas_hw, tl, 40.0,
                                 n_bands=2)
    fn1 = make_sharded_multiband(mesh1, 3, (48, 64), canvas_hw, tl, 40.0,
                                 n_bands=2)
    args = (jnp.asarray(imgs), jnp.asarray(ks), jnp.asarray(rs),
            jnp.asarray(weights))
    out4 = np.asarray(fn4(*args))
    out1 = np.asarray(fn1(*args))
    np.testing.assert_allclose(out4, out1, atol=1e-2)


def test_batched_register_sharded():
    mesh = make_mesh((4, 2), ("dp", "sp"))
    rng = np.random.default_rng(1)
    pairs = rng.uniform(0, 255, (8, 2, 64, 64)).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    reg = make_batched_register(mesh, (64, 64), n_features=64, n_hyp=32)
    h, conf, ninl = reg(jnp.asarray(pairs), keys)
    assert h.shape == (8, 3, 3)
    assert "dp" in str(conf.sharding.spec)


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_fused_compose_matches_single_device():
    """Canvas-sharded compose == single-device fused compose (interior)."""
    from image_stitching_tpu.config import BlenderType
    from image_stitching_tpu.ops.warps import make_warper
    from image_stitching_tpu.pipeline.compose_fused import (
        fused_compose, fused_compose_sharded)

    imgs, ks, rs = _scene(n=3, h=48, w=64, focal=40.0)
    # Smooth content: pyramid boundary effects then stay sub-LSB.
    yy, xx = np.mgrid[:48, :64].astype(np.float32)
    imgs = np.stack([np.stack([100 + xx + 10 * i, 80 + yy, 90 + 0 * xx],
                              -1) for i in range(3)]).astype(np.float32)
    warper = make_warper("spherical", 40.0)
    corners, sizes = [], []
    for i in range(3):
        x, y, w, h = warper.warp_roi((48, 64), ks[i], rs[i])
        corners.append((x, y))
        sizes.append((w, h))
    seam_masks = [np.full((sizes[i][1], sizes[i][0]), 255, np.uint8)
                  for i in range(3)]
    args = (jnp.asarray(imgs), ks, rs, warper, corners, sizes,
            seam_masks, corners, 1.0, None, BlenderType.MULTI_BAND, 5.0)
    pano1, m1 = fused_compose(*args)
    mesh = make_mesh((1, 4), ("dp", "sp"))
    pano4, m4 = fused_compose_sharded(mesh, *args)
    assert pano4.shape == pano1.shape and m4.shape == m1.shape
    both = np.asarray(m1) & np.asarray(m4)
    diff = np.abs(pano4 - pano1)[both]
    assert float(np.mean(diff)) < 0.5, float(np.mean(diff))
    assert float(np.percentile(diff, 99)) <= 2.0, (
        float(np.percentile(diff, 99)))


def test_sharded_feather_matches_single_device():
    """Sharded FEATHER == single-device fused feather, exactly: the
    widened recompute margin makes the per-shard L1 EDT exact for every
    interior pixel, so the weight maps agree bit-for-bit."""
    from image_stitching_tpu.config import BlenderType
    from image_stitching_tpu.ops.warps import make_warper
    from image_stitching_tpu.pipeline.compose_fused import (
        fused_compose, fused_compose_sharded)

    imgs, ks, rs = _scene(n=3, h=48, w=64, focal=40.0)
    warper = make_warper("spherical", 40.0)
    corners, sizes = [], []
    for i in range(3):
        x, y, w, h = warper.warp_roi((48, 64), ks[i], rs[i])
        corners.append((x, y))
        sizes.append((w, h))
    seam_masks = [np.full((sizes[i][1], sizes[i][0]), 255, np.uint8)
                  for i in range(3)]
    args = (jnp.asarray(imgs), ks, rs, warper, corners, sizes,
            seam_masks, corners, 1.0, None, BlenderType.FEATHER, 5.0)
    pano1, m1 = fused_compose(*args)
    mesh = make_mesh((1, 4), ("dp", "sp"))
    pano4, m4 = fused_compose_sharded(mesh, *args)
    both = np.asarray(m1) & np.asarray(m4)
    assert both.any()
    diff = np.abs(pano4 - pano1)[both]
    assert float(diff.max()) == 0.0, float(diff.max())
