"""Pallas TPU kernel: fused Hamming 2-NN over binary descriptors.

The XLA formulation in ops.matching materializes the full (Ka, Kb) distance
matrix in HBM (4000^2 x 4B = 64 MB per image pair, written + re-read by
top_k).  This kernel fuses the bit-plane matmul with the 2-NN reduction:
per A-row tile it runs the MXU matmul against B tiles and folds each tile
straight into running (best, second-best) accumulators — the distance
matrix never leaves VMEM.

Bit unpacking (uint32 words -> 0/1 planes) happens outside the kernel in
XLA: a (K, 8) uint32 tensor has a pathological TPU layout (8 of 128 lanes),
while the unpacked (K, 256) plane tensor is MXU-native and only 4 MB.

d(a, b) = pop(a) + pop(b) - 2 * <bits_a, bits_b>  (exact: counts < 257).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["hamming_two_nn_pallas"]

_BIG = float(2 ** 30)


def _init_state(ta: int):
    return (jnp.full((ta,), _BIG, jnp.float32),
            jnp.zeros((ta,), jnp.int32),
            jnp.full((ta,), _BIG, jnp.float32),
            jnp.zeros((ta,), jnp.int32))


def _make_body(a_bits, pa, load_b_bits, load_pb, tile_b: int):
    """B-tile fold: matmul on the MXU + best/second-best merge.

    a_bits: (TA, 256) values; pa: (TA,); load_b_bits/load_pb: callables
    (lo, size) -> values, abstracting 2D vs batched-3D ref layouts.
    """
    def body(bi, carry):
        d1, i1, d2, i2 = carry
        b_bits = load_b_bits(bi * tile_b, tile_b)
        pb = load_pb(bi * tile_b, tile_b)
        common = jax.lax.dot_general(
            a_bits, b_bits, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (TA, TB)
        d = pa[:, None] + pb[None, :] - 2.0 * common
        cols = (bi * tile_b + jax.lax.broadcasted_iota(
            jnp.int32, d.shape, 1))

        # Tile-local best/second-best per row, gather-free (Mosaic has no
        # general gather): index = masked-min of column ids at the minimum
        # (ties resolve to the smallest id, like top_k's first occurrence).
        big_i = jnp.int32(2 ** 30)
        t1 = jnp.min(d, axis=1)
        j1 = jnp.min(jnp.where(d == t1[:, None], cols, big_i), axis=1)
        d_m = jnp.where(cols == j1[:, None], _BIG, d)
        t2 = jnp.min(d_m, axis=1)
        j2 = jnp.min(jnp.where(d_m == t2[:, None], cols, big_i), axis=1)

        # Merge running (1,2) with tile (1,2): both pairs are ordered, so
        # one comparison network yields the global two smallest.
        def pair_min(da, ia, db, ib):
            take_a = (da < db) | ((da == db) & (ia <= ib))
            return (jnp.where(take_a, da, db), jnp.where(take_a, ia, ib),
                    jnp.where(take_a, db, da), jnp.where(take_a, ib, ia))

        lo1d, lo1i, hi1d, hi1i = pair_min(d1, i1, t1, j1)
        lo2d, lo2i, _, _ = pair_min(d2, i2, t2, j2)
        nd2, ni2, _, _ = pair_min(hi1d, hi1i, lo2d, lo2i)
        return lo1d, lo1i, nd2, ni2

    return body


def _kernel(a_bits_ref, pa_ref, b_bits_ref, pb_ref, d1_ref, i1_ref, d2_ref,
            i2_ref, *, tile_b: int, kb: int):
    """Grid: one program per A-row tile; loops B tiles resident in VMEM."""
    a_bits = a_bits_ref[:]                   # (TA, 256) f32
    body = _make_body(a_bits, pa_ref[:, 0],
                      lambda lo, sz: b_bits_ref[pl.ds(lo, sz), :],
                      lambda lo, sz: pb_ref[pl.ds(lo, sz), 0], tile_b)
    d1, i1, d2, i2 = jax.lax.fori_loop(0, kb // tile_b, body,
                                       _init_state(a_bits.shape[0]))
    d1_ref[:, 0] = d1
    i1_ref[:, 0] = i1
    d2_ref[:, 0] = d2
    i2_ref[:, 0] = i2


def _unpack_bits(words: jnp.ndarray) -> jnp.ndarray:
    """(K, W) uint32 -> (K, W*32) f32 bit planes (XLA-side)."""
    k, w = words.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(k, w * 32).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile_a", "tile_b"))
def hamming_two_nn_pallas_batched(desc_a, desc_b, valid_b,
                                  tile_a: int = 256, tile_b: int = 1024):
    """Batched 2-NN: (B, K, W) descriptors -> per-batch (i1, d1, i2, d2).

    The batch rides a leading grid dimension (one kernel launch for the
    whole pair set) — `jax.vmap` of a pallas_call lowers ~10x slower.
    """
    bsz, ka0, w = desc_a.shape
    kb0 = desc_b.shape[1]
    pad_a = (-ka0) % min(tile_a, max(ka0, 8))
    pad_b = (-kb0) % min(tile_b, max(kb0, 8))
    if pad_a:
        desc_a = jnp.pad(desc_a, [(0, 0), (0, pad_a), (0, 0)])
    if pad_b:
        desc_b = jnp.pad(desc_b, [(0, 0), (0, pad_b), (0, 0)])
        valid_b = jnp.pad(valid_b, [(0, 0), (0, pad_b)])
    ka, kb = desc_a.shape[1], desc_b.shape[1]
    tile_a = min(tile_a, ka)
    tile_b = min(tile_b, kb)

    a_bits = jax.vmap(_unpack_bits)(desc_a)
    b_bits = jax.vmap(_unpack_bits)(desc_b)
    pa = jnp.sum(jax.lax.population_count(desc_a), axis=2).astype(
        jnp.float32)[..., None]
    pb = jnp.sum(jax.lax.population_count(desc_b), axis=2).astype(
        jnp.float32)
    pb = jnp.where(valid_b, pb, _BIG)[..., None]

    nbits = w * 32

    tile_a_final = tile_a

    def kernel_b(a_ref, pa_ref, b_ref, pb_ref, d1_ref, i1_ref, d2_ref,
                 i2_ref):
        body = _make_body(a_ref[0], pa_ref[0, :, 0],
                          lambda lo, sz: b_ref[0, pl.ds(lo, sz), :],
                          lambda lo, sz: pb_ref[0, pl.ds(lo, sz), 0],
                          tile_b)
        d1, i1, d2, i2 = jax.lax.fori_loop(0, kb // tile_b, body,
                                           _init_state(tile_a_final))
        d1_ref[0, :, 0] = d1
        i1_ref[0, :, 0] = i1
        d2_ref[0, :, 0] = d2
        i2_ref[0, :, 0] = i2

    d1, i1, d2, i2 = pl.pallas_call(
        kernel_b,
        grid=(bsz, ka // tile_a),
        in_specs=[
            pl.BlockSpec((1, tile_a, nbits), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_a, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, nbits), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, tile_a, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, ka, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ka, 1), jnp.int32),
            jax.ShapeDtypeStruct((bsz, ka, 1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ka, 1), jnp.int32),
        ),
    )(a_bits, pa, b_bits, pb)
    d1 = jnp.minimum(d1[:, :ka0, 0], _BIG)
    d2 = jnp.minimum(d2[:, :ka0, 0], _BIG)
    return i1[:, :ka0, 0], d1, i2[:, :ka0, 0], d2


@functools.partial(jax.jit, static_argnames=("tile_a", "tile_b"))
def hamming_two_nn_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                          valid_b: jnp.ndarray, tile_a: int = 256,
                          tile_b: int = 1024):
    """2-NN Hamming search: returns (i1, d1, i2, d2), each (Ka,).

    desc_*: (K, W) uint32 bit words (K multiple of the tile sizes);
    valid_b: (Kb,) bool — invalid columns get distance 2^30, matching
    ops.matching._two_nn semantics.
    """
    ka0, w = desc_a.shape
    kb0 = desc_b.shape[0]
    # Auto-pad to tile multiples: padded A rows are sliced off the output,
    # padded B columns are invalid (sentinel distance).
    pad_a = (-ka0) % min(tile_a, max(ka0, 8))
    pad_b = (-kb0) % min(tile_b, max(kb0, 8))
    if pad_a:
        desc_a = jnp.pad(desc_a, [(0, pad_a), (0, 0)])
    if pad_b:
        desc_b = jnp.pad(desc_b, [(0, pad_b), (0, 0)])
        valid_b = jnp.pad(valid_b, [(0, pad_b)])
    ka, kb = desc_a.shape[0], desc_b.shape[0]
    tile_a = min(tile_a, ka)
    tile_b = min(tile_b, kb)
    assert ka % tile_a == 0 and kb % tile_b == 0, (ka, kb, tile_a, tile_b)

    a_bits = _unpack_bits(desc_a)
    b_bits = _unpack_bits(desc_b)
    pa = jnp.sum(jax.lax.population_count(desc_a), axis=1).astype(
        jnp.float32)[:, None]
    pb = jnp.sum(jax.lax.population_count(desc_b), axis=1).astype(
        jnp.float32)
    # Invalid B columns: poison their popcount so d >= 2^30 everywhere.
    pb = jnp.where(valid_b, pb, _BIG)[:, None]

    grid = (ka // tile_a,)
    nbits = w * 32
    kernel = functools.partial(_kernel, tile_b=tile_b, kb=kb)
    d1, i1, d2, i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_a, nbits), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_a, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, nbits), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_a, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_a, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_a, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_a, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ka, 1), jnp.float32),
            jax.ShapeDtypeStruct((ka, 1), jnp.int32),
            jax.ShapeDtypeStruct((ka, 1), jnp.float32),
            jax.ShapeDtypeStruct((ka, 1), jnp.int32),
        ),
    )(a_bits, pa, b_bits, pb)
    # Clamp distances for invalid columns back to the sentinel (poisoned
    # popcounts can overshoot 2^30 by the pa - 2*common terms).
    d1 = jnp.minimum(d1[:ka0, 0], _BIG)
    d2 = jnp.minimum(d2[:ka0, 0], _BIG)
    return i1[:ka0, 0], d1, i2[:ka0, 0], d2
