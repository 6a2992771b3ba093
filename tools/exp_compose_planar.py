"""Experiment: multiband pyramid+accumulate formulations on real TPU.

Isolates the non-warp half of the fused-compose scan body
(`pipeline/compose_fused.py:270-293`) and times it at bench shapes in
three formulations, fresh inputs every rep (the axon runtime memoizes
executions on identical buffers — CLAUDE.md):

  v0  current: interleaved (H, W, 3), separable slice blurs, lax.scan
  v1  planar (4, H, W) with weight-as-channel, matmul pyramids, lax.scan
  v2  planar batched: per-band laps for ALL images via one einsum
      (vmap-free batched matmul), scan only the canvas accumulate

Usage: python tools/exp_compose_planar.py  (runs on the default platform)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401  (matmul precision + cache)
from image_stitching_tpu.ops.blend import pyr_down, pyr_up
from image_stitching_tpu.ops.pyr_mat import down_mats, up_mats

N, PH, PW = 8, 544, 832          # bench-like: 8 x 0.45MP rects
CH, CW, B = 544, 3040, 5         # 3040x544 canvas, 5 bands


def offsets(rng):
    ox = rng.integers(0, (CW - PW) // 32 + 1, N) * 32
    oy = rng.integers(0, (CH - PH) // 32 + 1, N) * 32
    return np.stack([ox, oy], 1).astype(np.int32)


# ---------------------------------------------------------------- v0
@jax.jit
def v0(warped, weight, offs):
    accs = [jnp.zeros((CH >> b, CW >> b, 3), jnp.float32)
            for b in range(B + 1)]
    waccs = [jnp.zeros((CH >> b, CW >> b), jnp.float32)
             for b in range(B + 1)]

    def body(carry, inp):
        accs, waccs = carry
        img, wgt, off = inp
        gauss = [img]
        wg = [wgt[..., None]]
        for _ in range(B):
            gauss.append(pyr_down(gauss[-1]))
            wg.append(pyr_down(wg[-1]))
        na, nw = [], []
        for b in range(B + 1):
            lap = (gauss[b] - pyr_up(gauss[b + 1], gauss[b].shape[:2])
                   if b < B else gauss[b])
            ob = off >> b
            lh, lw = lap.shape[0], lap.shape[1]
            cur = jax.lax.dynamic_slice(accs[b], (ob[1], ob[0], 0),
                                        (lh, lw, 3))
            na.append(jax.lax.dynamic_update_slice(
                accs[b], cur + lap * wg[b], (ob[1], ob[0], 0)))
            curw = jax.lax.dynamic_slice(waccs[b], (ob[1], ob[0]), (lh, lw))
            nw.append(jax.lax.dynamic_update_slice(
                waccs[b], curw + wg[b][..., 0], (ob[1], ob[0])))
        return (na, nw), 0

    (accs, waccs), _ = jax.lax.scan(body, (accs, waccs),
                                    (warped, weight, offs))
    return accs[0], waccs[0]


# ---------------------------------------------------------------- v1
@jax.jit
def v1(stack4, offs):
    """stack4: (N, 4, PH, PW), channel 3 = weight."""
    accs = [jnp.zeros((4, CH >> b, CW >> b), jnp.float32)
            for b in range(B + 1)]

    def body(accs, inp):
        x, off = inp                       # (4, PH, PW)
        gauss = [x]
        for b in range(B):
            dh, dw = down_mats(PH >> b, PW >> b)
            gauss.append(jnp.einsum("oh,chw,pw->cop", dh, gauss[-1], dw))
        na = []
        for b in range(B + 1):
            g = gauss[b]
            if b < B:
                uh, uw = up_mats(g.shape[1], g.shape[2],
                                 g.shape[1] // 2, g.shape[2] // 2)
                up = jnp.einsum("oh,chw,pw->cop", uh, gauss[b + 1], uw)
                lap = g - up
            else:
                lap = g
            # weight channel accumulates its own gaussian, not a laplacian
            w = g[3:4]
            val = jnp.concatenate([lap[:3] * w, w], axis=0)
            ob = off >> b
            lh, lw = g.shape[1], g.shape[2]
            cur = jax.lax.dynamic_slice(accs[b], (0, ob[1], ob[0]),
                                        (4, lh, lw))
            na.append(jax.lax.dynamic_update_slice(
                accs[b], cur + val, (0, ob[1], ob[0])))
        return na, 0

    accs, _ = jax.lax.scan(body, accs, (stack4, offs))
    return accs[0]


# ---------------------------------------------------------------- v2
@jax.jit
def v2(stack4, offs):
    """Batched band pyramids (one einsum per level), scan only accumulate."""
    accs = [jnp.zeros((4, CH >> b, CW >> b), jnp.float32)
            for b in range(B + 1)]
    gauss = [stack4]                       # (N, 4, h, w)
    for b in range(B):
        dh, dw = down_mats(PH >> b, PW >> b)
        gauss.append(jnp.einsum("oh,nchw,pw->ncop", dh, gauss[-1], dw))
    vals = []
    for b in range(B + 1):
        g = gauss[b]
        if b < B:
            uh, uw = up_mats(g.shape[2], g.shape[3],
                             g.shape[2] // 2, g.shape[3] // 2)
            up = jnp.einsum("oh,nchw,pw->ncop", uh, gauss[b + 1], uw)
            lap = g - up
        else:
            lap = g
        w = g[:, 3:4]
        vals.append(jnp.concatenate([lap[:, :3] * w, w], axis=1))

    def body(accs, inp):
        off = inp[0]
        val_b = [v_[inp[1]] for v_ in vals]  # dynamic index over N
        na = []
        for b in range(B + 1):
            ob = off >> b
            lh, lw = val_b[b].shape[1], val_b[b].shape[2]
            cur = jax.lax.dynamic_slice(accs[b], (0, ob[1], ob[0]),
                                        (4, lh, lw))
            na.append(jax.lax.dynamic_update_slice(
                accs[b], cur + val_b[b], (0, ob[1], ob[0])))
        return na, 0

    accs, _ = jax.lax.scan(body, accs,
                           (offs, jnp.arange(N, dtype=jnp.int32)))
    return accs[0]


def _sync(y):
    """Honest completion barrier: block_until_ready through the axon
    tunnel returns before the device program finishes (CLAUDE.md);
    downloading a value does not."""
    return float(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[0])


def timeit(fn, make_args, reps=5):
    # Pre-upload `reps` fresh-content argument sets (defeats the axon
    # memoization) and sync them, then time back-to-back dispatches with
    # one download-sync at the end.
    argsets = [make_args(float(i + 2)) for i in range(reps + 1)]
    for a in argsets:
        for x in a:
            _sync(x)
    _sync(fn(*argsets[0]))       # compile warmup
    t0 = time.perf_counter()
    outs = [fn(*a) for a in argsets[1:]]
    _sync(outs[-1])
    dt = time.perf_counter() - t0
    # chained dispatches serialize on-device; one ~30ms sync amortized
    return (dt - 0.03) / reps, dt / reps


def main():
    rng = np.random.default_rng(0)
    base_w = rng.uniform(0, 255, (N, PH, PW, 3)).astype(np.float32)
    base_m = rng.uniform(0, 1, (N, PH, PW)).astype(np.float32)
    offs = jnp.asarray(offsets(rng))

    def args0(s):
        return (jnp.asarray(base_w) + s, jnp.asarray(base_m), offs)

    def args1(s):
        st = np.concatenate([base_w.transpose(0, 3, 1, 2),
                             base_m[:, None]], 1)
        return (jnp.asarray(st) + s, offs)

    print("platform:", jax.devices()[0].platform, flush=True)

    # correctness cross-check (v0 vs v1 vs v2) on small content
    a0, w0 = v0(*args0(0.0))
    a1 = v1(*args1(0.0))
    a2 = v2(*args1(0.0))
    e01 = float(jnp.abs(jnp.transpose(a1[:3], (1, 2, 0)) - a0).max())
    e0w = float(jnp.abs(a1[3] - w0).max())
    e12 = float(jnp.abs(a1 - a2).max())
    print(f"parity v0-v1 acc {e01:.2e} wacc {e0w:.2e}; v1-v2 {e12:.2e}",
          flush=True)

    for name, fn, mk in [("v0 interleaved scan", v0, args0),
                         ("v1 planar mm scan  ", v1, args1),
                         ("v2 planar mm batch ", v2, args1)]:
        net, gross = timeit(fn, mk)
        print(f"{name}: {net*1e3:8.2f} ms/run (net of sync; "
              f"gross {gross*1e3:8.2f})", flush=True)


if __name__ == "__main__":
    main()
