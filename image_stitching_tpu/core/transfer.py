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

__all__ = ["fetch_tree"]


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
