"""Bisect ORB detect-stack cost vs n_features on the real TPU.

mosaic100's matching stage is detect-bound: 57 ms/VGA image at K=4000 vs
11.5 ms at K~1024 (tools/exp_mosaic_match_split.py) — 5x for 4x the
keypoints, so something K-dependent dominates.  Phases per level:

  A  FAST + Harris + NMS + approx_max_k + subpixel  (K only in top-k)
  B  A + intensity-centroid orientation             (patch block gather)
  C  A + B + blur + rBRIEF describe                 (bigger patches +
                                                     take_along_axis)

C == the shipped `orb_detect_stack`.  B-A and C-B attribute the
K-scaling.  Honest sync per CLAUDE.md: fresh content per rep, value
download as the barrier.  Run on the chip, no concurrent CPU load.
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
from image_stitching_tpu.ops.features import orb  # noqa: E402
from image_stitching_tpu.ops.imgproc import gaussian_blur, resize, \
    scale_size  # noqa: E402

N, H, W = 16, 480, 640
REPS = 3


def _detect_xy(gray, *, n_features, n_levels=8, scale_factor=1.2,
               patch_size=40, fast_threshold=20.0, base_hw=(H, W),
               with_orient=False, with_desc=False, pattern=None,
               span=None):
    """Mirror of `_orb_impl`'s per-level structure, truncatable by phase."""
    h, w = base_hw
    counts = orb._per_level_counts(n_features, n_levels, scale_factor)
    outs = []
    for level in range(n_levels):
        scale = scale_factor ** level
        lh, lw = scale_size(h, w, 1.0 / scale)
        if min(lh, lw) < patch_size + 8 or counts[level] == 0:
            continue
        img_l = (resize(gray, (lh, lw)) if level
                 else gray.astype(jnp.float32))
        k_l = counts[level]
        corner = orb.fast_corner_mask(gray if level == 0 else img_l,
                                      fast_threshold)
        harris = orb.harris_response_map(img_l)
        masked = jnp.where(corner, harris, -jnp.inf)
        pooled = jax.lax.reduce_window(
            masked[None, ..., None], -jnp.inf, jax.lax.max,
            (1, 3, 3, 1), (1, 1, 1, 1), "SAME")[0, ..., 0]
        border = patch_size // 2 + 2
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
        hpad = jnp.pad(harris, 1, mode="edge")
        hc = hpad[kyi + 1, kxi + 1]
        hl = hpad[kyi + 1, kxi]
        hr = hpad[kyi + 1, kxi + 2]
        ht = hpad[kyi, kxi + 1]
        hb = hpad[kyi + 2, kxi + 1]
        denx = hl - 2.0 * hc + hr
        deny = ht - 2.0 * hc + hb
        dx = jnp.clip(jnp.where(jnp.abs(denx) > 1e-12,
                                0.5 * (hl - hr) /
                                jnp.where(jnp.abs(denx) > 1e-12, denx, 1.0),
                                0.0), -0.5, 0.5)
        dy = jnp.clip(jnp.where(jnp.abs(deny) > 1e-12,
                                0.5 * (ht - hb) /
                                jnp.where(jnp.abs(deny) > 1e-12, deny, 1.0),
                                0.0), -0.5, 0.5)
        xy_l = jnp.stack([kxi.astype(jnp.float32) + dx,
                          kyi.astype(jnp.float32) + dy], -1)
        acc = jnp.sum(xy_l) + jnp.sum(top_vals)
        if with_orient:
            angle = orb._orientations(img_l, xy_l, patch_size // 2)
            acc = acc + jnp.sum(angle)
            if with_desc:
                img_blur = gaussian_blur(img_l, 2.0, 3)
                desc = orb._describe_impl(img_blur, xy_l, angle, pattern,
                                          span=span)
                acc = acc + jnp.sum(desc.astype(jnp.float32))
        outs.append(acc)
    return jnp.stack(outs).sum()


def timed(fn, grays_np, label):
    out = fn(jnp.asarray(grays_np + 0.5))   # compile
    float(np.asarray(out))
    ts = []
    for rep in range(REPS):
        g = jnp.asarray(grays_np + float(rep + 1))
        float(np.asarray(jnp.ravel(g)[0]))
        t0 = time.perf_counter()
        o = fn(g)
        float(np.asarray(o))
        ts.append(time.perf_counter() - t0)
    best = min(ts) * 1000 / N
    print(f"{label}: {best:7.2f} ms/img  (reps {[f'{t*1e3/N:.1f}' for t in ts]})",
          flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    grays = rng.uniform(0, 255, (N, H, W)).astype(np.float32)
    pattern = jnp.asarray(orb.resolve_pattern(None, 40))
    span = orb._pattern_span(orb.resolve_pattern(None, 40))

    for k in (1024, 4000):
        chunk = min(orb._detect_chunk(H, W, k, span), N)

        def stack(fn_one):
            @jax.jit
            def run(gs):
                if N % chunk:
                    pad = chunk - N % chunk
                    gs = jnp.concatenate([gs, gs[-1:].repeat(pad, 0)])
                r = jax.lax.map(jax.vmap(fn_one),
                                gs.reshape((-1, chunk) + gs.shape[1:]))
                return jnp.sum(r)
            return run

        a = stack(functools.partial(_detect_xy, n_features=k))
        b = stack(functools.partial(_detect_xy, n_features=k,
                                    with_orient=True))
        c = stack(functools.partial(_detect_xy, n_features=k,
                                    with_orient=True, with_desc=True,
                                    pattern=pattern, span=span))
        print(f"== K={k} (chunk {chunk}) ==", flush=True)
        ta = timed(a, grays, "A detect-only      ")
        tb = timed(b, grays, "B +orientation     ")
        tc = timed(c, grays, "C +blur+describe   ")
        print(f"   orient {tb - ta:6.2f} ms/img   describe {tc - tb:6.2f} "
              f"ms/img", flush=True)
        # The shipped entry as the control.
        f = orb.orb_detect_stack(grays + 0.25, n_features=k)
        float(np.asarray(f.xy[0, 0, 0]))
        g2 = grays + 9.0
        t0 = time.perf_counter()
        f = orb.orb_detect_stack(g2, n_features=k)
        float(np.asarray(f.xy[0, 0, 0]))
        print(f"   shipped orb_detect_stack: "
              f"{(time.perf_counter() - t0) * 1000 / N:7.2f} ms/img",
              flush=True)


if __name__ == "__main__":
    main()
