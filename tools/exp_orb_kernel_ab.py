"""On-chip A/B: orb_sample_pallas vs the shipped detect sampling.

Round-4 policy (NOTES_r04): always A/B the COMPOSED stack program on
chip before committing a detect-path rework — isolated microbenches of
gathers lie.  Three parts:

  1. lowering + exactness smoke: the kernel (interpret=False) on one
     VGA image; samples must equal the XLA fetch oracle bit-for-bit,
     angles must match _orientations to 1e-4 (f32 reduction order).
  2. composed detect stack A/B at K=1000 and K=4000: the shipped
     orb_detect_stack vs a kernel-path variant of the same stack
     (lax.map over vmapped chunks, identical level structure).
  3. fresh content per rep, value-download sync (CLAUDE.md).
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
from image_stitching_tpu.kernels.orb_sample_pallas import (  # noqa: E402
    orb_sample_pallas)
from image_stitching_tpu.ops.features import orb  # noqa: E402
from image_stitching_tpu.ops.imgproc import gaussian_blur, resize, \
    scale_size  # noqa: E402

N, H, W = 16, 480, 640
REPS = 3

PATTERN = orb.resolve_pattern(None, 40)
PAT_XY = np.stack([
    np.concatenate([PATTERN[:, 0], PATTERN[:, 2]]),
    np.concatenate([PATTERN[:, 1], PATTERN[:, 3]])]).astype(np.float32)
SPAN = max(orb._pattern_span(PATTERN), 20)


def smoke():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    blur = np.asarray(gaussian_blur(jnp.asarray(img), 2.0, 3))
    k = 4000
    xy = np.stack([rng.uniform(22, W - 23, k),
                   rng.uniform(22, H - 23, k)], -1).astype(np.float32)
    samples, ang_k, mom = orb_sample_pallas(
        jnp.asarray(img), jnp.asarray(blur), jnp.asarray(xy),
        jnp.asarray(PAT_XY), radius=20, span=SPAN)
    samples = np.asarray(samples)
    mom = np.asarray(mom)
    ang = np.arctan2(mom[:, 1], mom[:, 0])
    ang_ref = np.asarray(orb._orientations(jnp.asarray(img),
                                           jnp.asarray(xy), 20))
    # Quotient-form rotation, exactly as in the kernel.
    m10, m01 = mom[:, 0], mom[:, 1]
    nrm = np.sqrt(m10 * m10 + m01 * m01, dtype=np.float32)
    safe = np.maximum(nrm, np.float32(1e-30))
    ca = np.where(nrm > 0, (m10 / safe).astype(np.float32), np.float32(1))
    sa = np.where(nrm > 0, (m01 / safe).astype(np.float32), np.float32(0))
    ca, sa = ca[:, None], sa[:, None]
    gx = np.clip(np.round(xy[:, 0:1] + ca * PAT_XY[0][None]
                          - sa * PAT_XY[1][None]).astype(np.int64),
                 0, W - 1)
    gy = np.clip(np.round(xy[:, 1:2] + sa * PAT_XY[0][None]
                          + ca * PAT_XY[1][None]).astype(np.int64),
                 0, H - 1)
    want = blur[gy, gx]
    n_bad = int((samples != want).sum())
    print(f"smoke: angle max|d|={np.abs(ang - ang_ref).max():.2e}  "
          f"sample mismatches={n_bad}/{samples.size}", flush=True)
    # Chip f32 sqrt/div may differ from numpy by ulps; tolerate only a
    # vanishing count of .5-boundary flips.
    assert n_bad <= samples.size // 10000, n_bad


def _detect_stack_kernel(grays, n_features):
    """The shipped stack structure with the kernel replacing
    _orientations + _describe_impl."""
    pat = jnp.asarray(PAT_XY)
    pattern = jnp.asarray(PATTERN)

    def one(gray):
        h, w = H, W
        counts = orb._per_level_counts(n_features, 8, 1.2)
        parts = []
        for level in range(8):
            scale = 1.2 ** level
            lh, lw = scale_size(h, w, 1.0 / scale)
            if min(lh, lw) < 48 or counts[level] == 0:
                continue
            img_l = (resize(gray, (lh, lw)) if level
                     else gray.astype(jnp.float32))
            k_l = counts[level]
            corner = orb.fast_corner_mask(gray if level == 0 else img_l,
                                          20.0)
            harris = orb.harris_response_map(img_l)
            masked = jnp.where(corner, harris, -jnp.inf)
            pooled = jax.lax.reduce_window(
                masked[None, ..., None], -jnp.inf, jax.lax.max,
                (1, 3, 3, 1), (1, 1, 1, 1), "SAME")[0, ..., 0]
            border = 22
            yy = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 1)
            inb = ((yy >= border) & (yy < lh - border) &
                   (xx >= border) & (xx < lw - border))
            cand = corner & (masked >= pooled) & inb
            rank = jnp.where(cand, harris, -jnp.inf).reshape(-1)
            top_vals, top_idx = jax.lax.approx_max_k(rank, k_l,
                                                     recall_target=0.95)
            kyi = (top_idx // lw).astype(jnp.int32)
            kxi = (top_idx % lw).astype(jnp.int32)
            xy_l = jnp.stack([kxi.astype(jnp.float32),
                              kyi.astype(jnp.float32)], -1)
            img_blur = gaussian_blur(img_l, 2.0, 3)
            samples, ang_k, mom = orb_sample_pallas(
                img_l, img_blur, xy_l, pat, radius=20, span=SPAN)
            bits = samples[:, :256] < samples[:, 256:]
            kk, nb = bits.shape
            words = bits.reshape(kk, nb // 32, 32).astype(jnp.uint32)
            wgt = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[
                None, None]
            desc = jnp.sum(words * wgt, axis=-1, dtype=jnp.uint32)
            ang = jnp.arctan2(mom[:, 1], mom[:, 0])
            parts.append((jnp.sum(xy_l), jnp.sum(ang),
                          jnp.sum(desc.astype(jnp.float32))))
        return jax.tree.map(lambda *xs: jnp.stack(xs).sum(), *parts)

    chunk = min(orb._detect_chunk(H, W, n_features, SPAN), N)

    @jax.jit
    def run(gs):
        if N % chunk:
            gs = jnp.concatenate(
                [gs, gs[-1:].repeat(chunk - N % chunk, 0)])
        r = jax.lax.map(jax.vmap(one),
                        gs.reshape((-1, chunk) + gs.shape[1:]))
        return jax.tree.map(jnp.sum, r)

    return run


def ab():
    rng = np.random.default_rng(1)
    grays = rng.uniform(0, 255, (N, H, W)).astype(np.float32)
    for k in (1000, 4000):
        run_kernel = _detect_stack_kernel(grays, k)
        o = run_kernel(jnp.asarray(grays + 0.5))
        float(np.asarray(jax.tree.leaves(o)[0]))
        ts = []
        for rep in range(REPS):
            g = jnp.asarray(grays + float(rep + 1))
            float(np.asarray(jnp.ravel(g)[0]))
            t0 = time.perf_counter()
            o = run_kernel(g)
            float(np.asarray(jax.tree.leaves(o)[0]))
            ts.append(time.perf_counter() - t0)
        print(f"K={k}: kernel-path stack {min(ts) * 1e3 / N:7.2f} ms/img "
              f"({[f'{t * 1e3 / N:.1f}' for t in ts]})", flush=True)

        f = orb.orb_detect_stack(jnp.asarray(grays + 0.25), n_features=k)
        float(np.asarray(f.xy[0, 0, 0]))
        ts = []
        for rep in range(REPS):
            g = jnp.asarray(grays + 10.0 + rep)
            float(np.asarray(jnp.ravel(g)[0]))
            t0 = time.perf_counter()
            f = orb.orb_detect_stack(g, n_features=k)
            float(np.asarray(f.xy[0, 0, 0]))
            ts.append(time.perf_counter() - t0)
        print(f"K={k}: shipped stack     {min(ts) * 1e3 / N:7.2f} ms/img "
              f"({[f'{t * 1e3 / N:.1f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    smoke()
    ab()
