"""Pin down which primitive caps elementwise throughput at ~130 MP/s.

pyr_down (5-tap separable, shifted-slice adds) measures 60 ms compute-only
on an 8 MP HWC image — ~50x off HBM roofline.  Time each suspect primitive
in isolation on the same buffer (fresh content, scalar-reduced output so
the tunnel download is 4 bytes).

Run:  timeout 1800 python tools/profile_vpu.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


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
    h, w = 2448, 3264
    hwc = jax.device_put(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    hw = jax.device_put(rng.uniform(0, 255, (h, w)).astype(np.float32))
    jax.block_until_ready((hwc, hw))

    @jax.jit
    def ew_hwc(x):
        return jnp.sum(x * 2.0 + 1.0)
    bench("elementwise HWC (H,W,3)", ew_hwc, lambda r: (hwc + np.float32(r),))

    @jax.jit
    def ew_hw(x):
        return jnp.sum(x * 2.0 + 1.0)
    bench("elementwise HW (H,W)", ew_hw, lambda r: (hw + np.float32(r),))

    @jax.jit
    def stride_hw(x):
        return jnp.sum(x[::2, ::2])
    bench("strided [::2,::2] HW", stride_hw, lambda r: (hw + np.float32(r),))

    @jax.jit
    def pad_reflect(x):
        return jnp.sum(jnp.pad(x, ((2, 2), (0, 0)), mode="reflect"))
    bench("pad reflect rows HW", pad_reflect, lambda r: (hw + np.float32(r),))

    @jax.jit
    def shift5_rows(x):
        xp = jnp.pad(x, ((2, 2), (0, 0)), mode="reflect")
        s = sum(0.2 * xp[i:i + h] for i in range(5))
        return jnp.sum(s)
    bench("5-tap rows HW (pad+shift)", shift5_rows,
          lambda r: (hw + np.float32(r),))

    @jax.jit
    def shift5_cols(x):
        xp = jnp.pad(x, ((0, 0), (2, 2)), mode="reflect")
        s = sum(0.2 * xp[:, i:i + w] for i in range(5))
        return jnp.sum(s)
    bench("5-tap cols HW (pad+shift)", shift5_cols,
          lambda r: (hw + np.float32(r),))

    @jax.jit
    def sep5_full(x):
        xp = jnp.pad(x, ((2, 2), (0, 0)), mode="reflect")
        a = sum(0.2 * xp[i:i + h] for i in range(5))
        ap = jnp.pad(a, ((0, 0), (2, 2)), mode="reflect")
        b = sum(0.2 * ap[:, i:i + w] for i in range(5))
        return jnp.sum(b[::2, ::2])
    bench("sep5 + stride HW", sep5_full, lambda r: (hw + np.float32(r),))

    # conv-based 5x5 via reduce_window-ish: XLA conv with NCHW 1-channel
    kern = jnp.asarray(
        (np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]) / 256.0
         ).astype(np.float32))[None, None]

    @jax.jit
    def conv5(x):
        y = jax.lax.conv_general_dilated(
            x[None, None], kern, (2, 2), "SAME")
        return jnp.sum(y)
    bench("conv 5x5 stride2 NCHW1", conv5, lambda r: (hw + np.float32(r),))

    # batched layout: (8, H/?, W) — does batching amortize?
    b8 = jax.device_put(rng.uniform(0, 255, (8, h // 2, w)).astype(np.float32))
    jax.block_until_ready(b8)

    @jax.jit
    def shift5_b(x):
        xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)), mode="reflect")
        s = sum(0.2 * xp[:, i:i + h // 2] for i in range(5))
        return jnp.sum(s)
    bench("5-tap rows batched (8,H/2,W)", shift5_b,
          lambda r: (b8 + np.float32(r),))

    # bf16 elementwise
    hbf = hw.astype(jnp.bfloat16)
    jax.block_until_ready(hbf)

    @jax.jit
    def ew_bf(x):
        return jnp.sum((x * 2.0 + 1.0).astype(jnp.float32))
    bench("elementwise HW bf16", ew_bf,
          lambda r: (hbf + jnp.bfloat16(r),))

    # gather: one 8MP bilinear-style fetch from (H, W)
    yy = jax.device_put(
        rng.integers(0, h - 1, (h, w)).astype(np.int32))
    xx = jax.device_put(
        rng.integers(0, w - 1, (h, w)).astype(np.int32))
    jax.block_until_ready((yy, xx))

    @jax.jit
    def gather1(x, yyy, xxx):
        return jnp.sum(x[yyy, xxx])
    bench("random gather 8MP from HW", gather1,
          lambda r: (hw + np.float32(r), yy, xx))

    @jax.jit
    def gather_flat(x, yyy, xxx):
        return jnp.sum(jnp.take(x.ravel(), yyy * w + xxx))
    bench("random gather flat-index", gather_flat,
          lambda r: (hw + np.float32(r), yy, xx))


if __name__ == "__main__":
    main()
