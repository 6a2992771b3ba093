"""orb_sample_stream_pallas (interpret mode): the HBM-streaming variant
must be an EXACT drop-in for the VMEM-resident kernel — same windows,
same one-hot matmul selects, DMA'd instead of sliced.  Runs the Pallas
interpreter on CPU (tests/conftest.py forces the CPU backend)."""

import jax.numpy as jnp
import numpy as np

from image_stitching_tpu.kernels.orb_sample_pallas import orb_sample_pallas
from image_stitching_tpu.kernels.orb_stream_pallas import (
    orb_sample_stream_pallas, plane_stream_admissible)
from image_stitching_tpu.ops.features import orb


def _setup(seed=0, h=120, w=260, k=23):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    blur = rng.uniform(0, 255, (h, w)).astype(np.float32)
    border = 22
    xy = np.stack([
        rng.uniform(border, w - 1 - border, k),
        rng.uniform(border, h - 1 - border, k)], -1).astype(np.float32)
    pattern = orb.resolve_pattern(None, 40)
    pat_xy = np.stack([
        np.concatenate([pattern[:, 0], pattern[:, 2]]),
        np.concatenate([pattern[:, 1], pattern[:, 3]])]).astype(np.float32)
    span = max(orb._pattern_span(pattern), 20)
    return img, blur, xy, pat_xy, span


def test_stream_matches_resident_kernel_exactly():
    img, blur, xy, pat_xy, span = _setup(seed=3)
    a = orb_sample_pallas(jnp.asarray(img), jnp.asarray(blur),
                          jnp.asarray(xy), jnp.asarray(pat_xy),
                          radius=20, span=span, interpret=True)
    b = orb_sample_stream_pallas(jnp.asarray(img), jnp.asarray(blur),
                                 jnp.asarray(xy), jnp.asarray(pat_xy),
                                 radius=20, span=span, interpret=True)
    for x, y, name in zip(a, b, ("samples", "angle", "moments")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_stream_edge_keypoints():
    """Border-hugging keypoints: window DMAs must stay inside the padded
    plane, values equal the resident kernel's."""
    rng = np.random.default_rng(11)
    h, w = 72, 200
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    blur = rng.uniform(0, 255, (h, w)).astype(np.float32)
    xy = np.array([[0.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0],
                   [w - 1.0, 0.0], [22.0, 22.0], [w - 23.0, h - 23.0],
                   [w / 2, 3.0], [3.0, h / 2]], np.float32)
    pattern = orb.resolve_pattern(None, 40)
    pat_xy = np.stack([
        np.concatenate([pattern[:, 0], pattern[:, 2]]),
        np.concatenate([pattern[:, 1], pattern[:, 3]])]).astype(np.float32)
    span = max(orb._pattern_span(pattern), 20)
    a = orb_sample_pallas(jnp.asarray(img), jnp.asarray(blur),
                          jnp.asarray(xy), jnp.asarray(pat_xy),
                          radius=20, span=span, interpret=True)
    b = orb_sample_stream_pallas(jnp.asarray(img), jnp.asarray(blur),
                                 jnp.asarray(xy), jnp.asarray(pat_xy),
                                 radius=20, span=span, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_stream_under_vmap_matches_loop():
    """jax.vmap over the stream kernel (the detect-stack path) must
    match per-image calls — the custom sequential-vmap rule, since the
    Mosaic ANY-space lowering cannot batch the plane input."""
    import jax
    imgs, blurs, xys = [], [], []
    for s in range(3):
        img, blur, xy, pat_xy, span = _setup(seed=20 + s, h=96, w=160,
                                             k=16)
        imgs.append(img)
        blurs.append(blur)
        xys.append(xy)
    f = lambda i, b, x: orb_sample_stream_pallas(
        i, b, x, jnp.asarray(pat_xy), radius=20, span=span,
        interpret=True)
    sv, av, mv = jax.vmap(f)(jnp.asarray(np.stack(imgs)),
                             jnp.asarray(np.stack(blurs)),
                             jnp.asarray(np.stack(xys)))
    for i in range(3):
        s1, a1, m1 = f(jnp.asarray(imgs[i]), jnp.asarray(blurs[i]),
                       jnp.asarray(xys[i]))
        np.testing.assert_array_equal(np.asarray(sv[i]), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(mv[i]), np.asarray(m1))


def test_stream_admissibility_covers_flagship_shapes():
    # The resident kernel excludes these (VERDICT r04 weak #3); the
    # streaming variant admits them.
    assert plane_stream_admissible(2448, 3264)   # 8 MP e2e level 0
    assert plane_stream_admissible(3000, 4000)   # 12 MP config-3 level 0
    assert not plane_stream_admissible(20000, 20000)
