"""Packed device->host transfers for the axon tunnel.

Every device->host download pays ~25-30 ms of tunnel latency regardless
of size (CLAUDE.md); a 7-leaf pytree fetched leaf-by-leaf (e.g.
`jax.tree.map(np.asarray, pair_matches)`) pays it 7x.  `fetch_tree`
bitcasts every leaf to uint8 ON DEVICE, concatenates them into one flat
buffer inside a single jitted program, downloads once, and re-views the
bytes on the host — one latency charge for the whole tree.

This is pipeline plumbing, not a reference capability; the reference is
a single-process CPU program with no transfer boundary (SURVEY.md §2c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fetch_tree", "pack_mask_bits", "unpack_mask_bits"]


@jax.jit
def pack_mask_bits(m):
    """(..., W) mask (nonzero = set) -> (..., ceil(W/8)) uint8, MSB-first.

    8x fewer d->h bytes for binary masks at the ~25-35 MB/s tunnel
    download rate; `np.unpackbits` (bit_order 'big') inverts on host."""
    w = m.shape[-1]
    pad = (-w) % 8
    mb = (m > 0).astype(jnp.int32)
    if pad:
        mb = jnp.pad(mb, [(0, 0)] * (mb.ndim - 1) + [(0, pad)])
    mb = mb.reshape(m.shape[:-1] + ((w + pad) // 8, 8))
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return jnp.einsum("...k,k->...", mb, weights).astype(jnp.uint8)


def unpack_mask_bits(bits: np.ndarray, w: int) -> np.ndarray:
    """Host inverse of pack_mask_bits: returns (..., w) uint8 in {0, 255}."""
    un = np.unpackbits(bits, axis=-1)[..., :w]
    return un * np.uint8(255)


def _pack(leaves):
    out = []
    for leaf in leaves:
        if leaf.dtype == jnp.bool_:
            leaf = leaf.astype(jnp.uint8)
        if leaf.dtype != jnp.uint8:
            leaf = jax.lax.bitcast_convert_type(leaf, jnp.uint8)
        out.append(leaf.reshape(-1))
    return jnp.concatenate(out) if len(out) > 1 else out[0]


_pack_jit = jax.jit(_pack)


def fetch_tree(tree):
    """Download a pytree of device arrays in ONE d->h transfer.

    Returns the same pytree structure with numpy leaves (original dtypes
    and shapes).  Leaves already on host (numpy) pass through untouched.
    """
    leaves, treedef = jax.tree.flatten(tree)
    idx = [i for i, leaf in enumerate(leaves)
           if isinstance(leaf, jax.Array)]
    if not idx:
        return tree
    dev = [leaves[i] for i in idx]
    metas = [(leaf.shape, np.dtype(leaf.dtype)) for leaf in dev]
    # First-run warm-up (core.logging._force_fence): drain the dispatch
    # queue BEFORE compiling+dispatching the packed program.  The axon
    # worker crashes (UNAVAILABLE) when a NEW program compiles through
    # the tunnel over a deep in-flight queue; the per-stage fences are
    # not granular enough for mid-stage packed fetches (observed at the
    # VGA warp stage with a cold compile cache).
    from .logging import _force_fence, device_fence
    if _force_fence:
        device_fence()
    buf = np.asarray(_pack_jit(dev))
    outs = []
    off = 0
    for shape, dtype in metas:
        nbytes = int(np.prod(shape, dtype=np.int64)) * (
            1 if dtype == np.bool_ else dtype.itemsize)
        chunk = buf[off:off + nbytes]
        off += nbytes
        if dtype == np.bool_:
            outs.append(chunk.astype(np.bool_).reshape(shape))
        else:
            outs.append(chunk.view(dtype).reshape(shape))
    for i, o in zip(idx, outs):
        leaves[i] = o
    return jax.tree.unflatten(treedef, leaves)
