"""Does the axon tunnel compress host->device uploads?

Uploads equal-size u8 buffers of different entropy and times each drain.
If natural-image/zeros uploads beat random uploads, the tunnel has a
compression layer and upload-bound stages should prefer compressible
encodings (e.g. low-entropy planar layouts) over raw interleaved pixels.

Sync discipline per CLAUDE.md: a value download after the upload chain is
the only honest barrier; fresh content per rep defeats memoization.

Usage: python tools/exp_upload_compress.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402

MB = 32
SHAPE = (MB, 1 << 20)


def natural(seed):
    """Smooth 2-D field quantized to u8 — image-like entropy."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 255, (MB, 1024)).astype(np.float32)
    big = np.repeat(small, 1024, axis=1)
    noise = rng.normal(0, 3, SHAPE).astype(np.float32)
    return np.clip(big + noise, 0, 255).astype(np.uint8)


def zeros(seed):
    z = np.zeros(SHAPE, np.uint8)
    z[0, 0] = seed  # fresh content
    return z


def randu8(seed):
    return np.random.default_rng(seed).integers(
        0, 256, SHAPE, dtype=np.uint8)


def natural_delta(seed):
    """Row-delta (mod 256) of the natural field: if the tunnel's LZ likes
    it better, gray uploads could ship delta-encoded and un-delta on
    device with a wrapping u8 cumsum."""
    x = natural(seed)
    d = x.copy()
    d[:, 1:] = x[:, 1:] - x[:, :-1]  # u8 wraps mod 256
    return d


def natural_jpeg_like(seed):
    """Decoded-JPEG-like field: natural() is synthetic; real decodes are
    blockwise-smooth.  Quantize 8x8 DCT-ish by box-averaging then adding
    back small detail, to bound how much smoothness helps."""
    x = natural(seed).astype(np.float32)
    blk = x.reshape(MB, -1, 8).mean(axis=2, keepdims=True)
    y = np.clip(np.repeat(blk, 8, axis=2).reshape(SHAPE), 0, 255)
    return y.astype(np.uint8)


@jax.jit
def consume(x):
    return jnp.float32(x[0, 0]) + jnp.float32(x[-1, -1])


def measure(make, reps=3):
    bufs = [make(i + 1) for i in range(reps)]
    # warm-up one upload+consume to compile
    _ = float(consume(jax.device_put(make(99)))[()] if False else
              consume(jax.device_put(make(99))).item())
    t0 = time.perf_counter()
    outs = []
    for b in bufs:
        outs.append(consume(jax.device_put(b)))
    s = float(outs[-1].item())
    dt = (time.perf_counter() - t0) / reps
    return MB / dt, s


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    for name, make in [("random u8   ", randu8),
                       ("natural u8  ", natural),
                       ("nat row-delta", natural_delta),
                       ("blocky (jpeg)", natural_jpeg_like),
                       ("zeros u8    ", zeros)]:
        rate, _ = measure(make)
        print(f"{name}: {rate:8.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
