"""Gather strategy probe: 4 scalar gathers vs one (2,2)-slice gather.

Bilinear warps need the 2x2 neighborhood of every sample point.  The
production code issues 4 independent gathers; lax.gather can instead fetch
a (2, 2[, C]) slice per index — 4x fewer gather descriptors for the same
bytes.  Measures both on the compose-rect shape (8 x 768x576 samples from
8 x 547x729x3 images).

Run:  timeout 1200 python tools/profile_gather.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N, HS, WS = 8, 547, 729       # source images (compose scale)
HO, WO = 576, 768             # output rect


def bench(label, fn, make_args, reps=3):
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    np.asarray(out).ravel()[:1]
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn(*make_args(r))
        np.asarray(out).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{label:<36} {np.median(ts) * 1e3:8.1f} ms")


def main():
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.uniform(0, 255, (N, HS, WS, 3)).astype(np.float32))
    sx = jax.device_put(
        rng.uniform(0, WS - 2, (N, HO, WO)).astype(np.float32))
    sy = jax.device_put(
        rng.uniform(0, HS - 2, (N, HO, WO)).astype(np.float32))
    jax.block_until_ready((imgs, sx, sy))

    @jax.jit
    def four_gathers(ims, xs, ys):
        def one(img, x, y):
            x0 = jnp.floor(x); y0 = jnp.floor(y)
            fx = (x - x0)[..., None]; fy = (y - y0)[..., None]
            x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
            i00 = img[y0i, x0i]
            i01 = img[y0i, x0i + 1]
            i10 = img[y0i + 1, x0i]
            i11 = img[y0i + 1, x0i + 1]
            return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
                    i10 * (1 - fx) * fy + i11 * fx * fy)
        return jnp.sum(jax.vmap(one)(ims, xs, ys))
    bench("4 scalar gathers (baseline)", four_gathers,
          lambda r: (imgs, sx + np.float32(r % 2), sy))

    @jax.jit
    def patch_gather(ims, xs, ys):
        def one(img, x, y):
            x0 = jnp.floor(x); y0 = jnp.floor(y)
            fx = (x - x0)[..., None]; fy = (y - y0)[..., None]
            idx = jnp.stack([y0.reshape(-1), x0.reshape(-1)],
                            -1).astype(jnp.int32)       # (P, 2)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(),
                start_index_map=(0, 1))
            patch = jax.lax.gather(
                img, idx, dn, slice_sizes=(2, 2, 3),
                mode=jax.lax.GatherScatterMode.CLIP)     # (P, 2, 2, 3)
            patch = patch.reshape(HO, WO, 2, 2, 3)
            i00 = patch[:, :, 0, 0]
            i01 = patch[:, :, 0, 1]
            i10 = patch[:, :, 1, 0]
            i11 = patch[:, :, 1, 1]
            return (i00 * (1 - fx) * (1 - fy) + i01 * fx * (1 - fy) +
                    i10 * (1 - fx) * fy + i11 * fx * fy)
        return jnp.sum(jax.vmap(one)(ims, xs, ys))
    bench("one (2,2,3) slice gather", patch_gather,
          lambda r: (imgs, sx + np.float32(r % 2), sy))

    # row-pair trick: gather row y0 with slice (1,2,3) twice (y0, y0+1)
    @jax.jit
    def two_gathers(ims, xs, ys):
        def one(img, x, y):
            x0 = jnp.floor(x); y0 = jnp.floor(y)
            fx = (x - x0)[..., None]; fy = (y - y0)[..., None]
            idx0 = jnp.stack([y0.reshape(-1), x0.reshape(-1)],
                             -1).astype(jnp.int32)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(0,),
                start_index_map=(0, 1))
            r0 = jax.lax.gather(img, idx0, dn, slice_sizes=(1, 2, 3),
                                mode=jax.lax.GatherScatterMode.CLIP)
            idx1 = idx0.at[:, 0].add(1)
            r1 = jax.lax.gather(img, idx1, dn, slice_sizes=(1, 2, 3),
                                mode=jax.lax.GatherScatterMode.CLIP)
            r0 = r0.reshape(HO, WO, 2, 3)
            r1 = r1.reshape(HO, WO, 2, 3)
            top = r0[:, :, 0] * (1 - fx) + r0[:, :, 1] * fx
            bot = r1[:, :, 0] * (1 - fx) + r1[:, :, 1] * fx
            return top * (1 - fy) + bot * fy
        return jnp.sum(jax.vmap(one)(ims, xs, ys))
    bench("two (1,2,3) row gathers", two_gathers,
          lambda r: (imgs, sx + np.float32(r % 2), sy))


if __name__ == "__main__":
    main()
