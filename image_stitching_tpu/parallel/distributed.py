"""Multi-host scale-out over DCN (SURVEY.md section 2c).

The reference is a single-process program; its only device parallelism is
optional intra-op CUDA offload (`image_stitching/image_stitching.cpp:52`,
`:645-649`, `:920-929`).  The TPU-native multi-host design target (SURVEY
2c "Batched-throughput mode ... pjit over DCN for multi-host") is:

  * each process (host) owns a TPU slice; `jax.distributed.initialize`
    joins them into one global runtime;
  * the ``dp`` mesh axis spans processes — whole stitches / pair batches
    are embarrassingly parallel, so the only DCN traffic is the initial
    shard placement and the final gather;
  * the ``sp`` (canvas) axis stays within a process so halo/pyramid
    traffic rides ICI.

`make_global_mesh` builds exactly that layout; `shard_local_batch` wraps
`jax.make_array_from_process_local_data` so every process feeds only its
own captures.  Exercised by a real 2-process CPU run in
tests/test_distributed.py (the standard JAX multi-process test pattern —
no TPU pod needed to validate the mesh/collective plumbing).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["init_distributed", "make_global_mesh", "shard_local_batch",
           "batched_register_distributed"]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> bool:
    """Gate `jax.distributed.initialize`: returns True when a multi-process
    runtime was started, False for the single-process default.

    With no arguments, honors the standard JAX env/cluster auto-detection
    only when JAX_COORDINATOR_ADDRESS is set; a bare single-host run stays
    single-process (the reference's semantics cost nothing).
    """
    import os

    import jax
    if num_processes is not None and num_processes <= 1:
        return False
    if (coordinator_address is None and num_processes is None
            and not os.environ.get("JAX_COORDINATOR_ADDRESS")):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def make_global_mesh(axis_names: Sequence[str] = ("dp", "sp"),
                     sp: int = 1):
    """Mesh over ALL processes' devices: dp rows span processes (DCN
    boundary), the sp axis is filled with same-process devices (ICI).

    `sp` must divide the per-process device count so no sp group ever
    crosses a host.
    """
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    per_proc = n // max(jax.process_count(), 1)
    if sp <= 0 or per_proc % sp != 0:
        raise ValueError(
            f"sp={sp} must divide the per-process device count {per_proc} "
            "(the canvas axis must stay on one host's ICI)")
    arr = np.array(devs, dtype=object).reshape(n // sp, sp)
    return Mesh(arr, tuple(axis_names))


def shard_local_batch(mesh, local_batch: np.ndarray, axis: str = "dp"):
    """Global dp-sharded array from each process's local shard.

    `local_batch` is this process's slice of the batch (equal size per
    process); the returned jax.Array has global shape
    (num_processes * local, ...) laid out P(axis)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def batched_register_distributed(mesh, hw: Tuple[int, int],
                                 n_features: int = 1024,
                                 match_conf: float = 0.32,
                                 n_hyp: int = 512):
    """Multi-host batched pair registration (BASELINE config 4 over DCN).

    Same jitted step as parallel.batched.make_batched_register, compiled
    against the GLOBAL mesh: feed it arrays from `shard_local_batch` and
    every process computes only its own pairs.  Returns
    fn(pairs (B_global, 2, H, W), keys (B_global, 2)) with dp-sharded
    outputs."""
    from .batched import make_batched_register
    return make_batched_register(mesh, hw, n_features=n_features,
                                 match_conf=match_conf, n_hyp=n_hyp)
