"""Batched-throughput mode: many registrations/pairs in parallel on a mesh.

BASELINE.json config 4 ('64 concurrent 4K pairs with vmapped RANSAC and
shared pyramid kernels'): a leading batch axis over whole pair
registrations, sharded dp over the mesh.  Each element runs the full
detect -> match -> RANSAC chain; results gather back sharded.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.matching import register_pair

__all__ = ["register_pairs_batched", "make_batched_register"]


def make_batched_register(mesh: Mesh, hw: Tuple[int, int],
                          n_features: int = 1024, match_conf: float = 0.32,
                          n_hyp: int = 512):
    """Build a jitted, dp-sharded batched pair-registration step.

    Returns fn(pairs (B, 2, H, W) float32 gray, keys (B, 2)) ->
    (h (B, 3, 3), confidence (B,), n_inliers (B,)).  B must divide by the
    dp axis size.
    """
    def one(pair, key):
        pm = register_pair(pair[0], pair[1], key, n_features=n_features,
                           match_conf=match_conf, n_hyp=n_hyp)
        return pm.h, pm.confidence, pm.num_inliers

    batched = jax.vmap(one)
    in_shard = (NamedSharding(mesh, P("dp")), NamedSharding(mesh, P("dp")))
    out_shard = (NamedSharding(mesh, P("dp")),) * 3
    return jax.jit(batched, in_shardings=in_shard, out_shardings=out_shard)


def register_pairs_batched(pairs, keys, mesh: Mesh, **kw):
    """Convenience wrapper: build + run (compiles per shape)."""
    fn = make_batched_register(mesh, (pairs.shape[2], pairs.shape[3]), **kw)
    return fn(pairs, keys)
