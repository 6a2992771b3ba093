"""Gather-spelling shootout for per-keypoint patch extraction (real TPU).

ORB detect at K=4000 is ~93% per-keypoint patch gathers
(tools/exp_orb_k_scaling.py: orient 12.6 + describe 27.4 of 42.7 ms/img)
running at ~1 element/cycle.  Candidate spellings, all producing the
same (K, S, S) f32 patches (or the 512 descriptor samples directly):

  dslice    vmapped dynamic_slice from the padded image   [shipped]
  flat      one flat element gather of all K*S*S elements
  direct    flat element gather of only the 512 rBRIEF samples/kp
  rowgather jnp.take of K*S full rows, then take_along cols
  u8        dslice on a uint8 image (byte-bound check)

Indices are FRESH random keypoints per rep (fed as device arrays), so
XLA cannot constant-fold the gather (round-4 lesson: fixed-index
microbenches lie).  Sync by value download.  N images vmapped like the
detect stack (chunk 8).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402

N, H, W, K = 8, 480, 640, 4000
S = 57            # describe-span patch
NBITS = 512       # rBRIEF endpoint samples per keypoint
REPS = 3


def bench(fn, args_fn, label):
    out = fn(*args_fn(0))
    float(np.asarray(out))
    ts = []
    for rep in range(1, REPS + 1):
        args = args_fn(rep)
        for a in args:
            float(np.asarray(jnp.ravel(a)[0]))
        t0 = time.perf_counter()
        o = fn(*args)
        float(np.asarray(o))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts) * 1e3 / N:7.2f} ms/img  "
          f"({[f'{t * 1e3 / N:.1f}' for t in ts]})", flush=True)


def main():
    rng = np.random.default_rng(0)
    span = S // 2

    def fresh(rep):
        r = np.random.default_rng(rep)
        imgs = r.uniform(0, 255, (N, H, W)).astype(np.float32)
        cy = r.integers(span, H - span, (N, K)).astype(np.int32)
        cx = r.integers(span, W - span, (N, K)).astype(np.int32)
        return jnp.asarray(imgs), jnp.asarray(cy), jnp.asarray(cx)

    @jax.jit
    def dslice(imgs, cy, cx):
        def per_img(img, y, x):
            pad = jnp.pad(img, span, mode="edge")
            return jax.vmap(
                lambda yy, xx: jax.lax.dynamic_slice(pad, (yy, xx), (S, S))
            )(y, x)
        p = jax.vmap(per_img)(imgs, cy - span + span, cx - span + span)
        return jnp.sum(p)

    @jax.jit
    def flat(imgs, cy, cx):
        dy, dx = np.mgrid[-span:span + 1, -span:span + 1]
        dy = jnp.asarray(dy.ravel(), jnp.int32)
        dx = jnp.asarray(dx.ravel(), jnp.int32)

        def per_img(img, y, x):
            idx = ((y[:, None] + dy[None, :]) * W +
                   (x[:, None] + dx[None, :]))          # (K, S*S)
            return jnp.take(img.ravel(), idx.ravel(), mode="clip")
        return jnp.sum(jax.vmap(per_img)(imgs, cy, cx))

    off = jnp.asarray(
        rng.integers(-span, span + 1, (NBITS, 2)).astype(np.int32))

    @jax.jit
    def direct(imgs, cy, cx):
        def per_img(img, y, x):
            yy = y[:, None] + off[None, :, 0]
            xx = x[:, None] + off[None, :, 1]
            return jnp.take(img.ravel(), (yy * W + xx).ravel(), mode="clip")
        return jnp.sum(jax.vmap(per_img)(imgs, cy, cx))

    @jax.jit
    def rowgather(imgs, cy, cx):
        dy = jnp.arange(-span, span + 1, dtype=jnp.int32)

        def per_img(img, y, x):
            rows = jnp.take(img, (y[:, None] + dy[None, :]).ravel(),
                            axis=0, mode="clip")         # (Kc*S, W)
            rows = rows.reshape(y.shape[0], S, W)
            colidx = (x[:, None] + dy[None, :])          # (K, S)
            return jnp.take_along_axis(
                rows, colidx[:, None, :].repeat(S, 1), axis=2)
        # keypoint-chunk to bound the (Kc, S, W) intermediate
        kc = 512
        out = 0.0
        for s0 in range(0, K, kc):
            out = out + jnp.sum(jax.vmap(
                lambda im, yy, xx: per_img(im, yy, xx))(
                    imgs, cy[:, s0:s0 + kc], cx[:, s0:s0 + kc]))
        return out

    @jax.jit
    def u8(imgs, cy, cx):
        def per_img(img, y, x):
            pad = jnp.pad(img.astype(jnp.uint8), span, mode="edge")
            p = jax.vmap(
                lambda yy, xx: jax.lax.dynamic_slice(pad, (yy, xx), (S, S))
            )(y, x)
            return jnp.sum(p.astype(jnp.float32))
        return jnp.sum(jax.vmap(per_img)(imgs, cy, cx))

    bench(dslice, fresh, "dslice  (K,57,57) f32")
    bench(flat, fresh, "flat    (K,57,57) f32")
    bench(direct, fresh, "direct  (K,512)   f32")
    bench(rowgather, fresh, "rowgath (K,57,57) f32")
    bench(u8, fresh, "dslice  (K,57,57) u8 ")


if __name__ == "__main__":
    main()
