"""Stage logging and wall-clock timing.

The reference's observability is `LOG`/`LOGLN` plus `getTickCount()` stage
timers (`/root/reference/image_stitching/image_stitching.cpp:41-43`,
`:900-902`, `:995`, `:1025`, `:1067`, `:1227`).  Here: a module logger with
the same user-visible stage messages, a `stage_timer` context manager that
calls `jax.block_until_ready` on device outputs for honest timings, and an
in-memory metrics dict the pipeline returns to callers.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Dict, Optional

import jax

logger = logging.getLogger("image_stitching_tpu")

__all__ = ["logger", "stage_timer", "StageTimes", "device_fence"]

StageTimes = Dict[str, float]

_FENCE = os.environ.get("STITCH_FENCE_TIMERS", "") not in ("", "0")

# Compile-safe mode (see pipeline/stitcher.py): the axon worker crashes
# (UNAVAILABLE, reproducibly) when NEW programs compile through the
# tunnel while a deep async dispatch queue is in flight.  The pipeline
# fences per stage on the FIRST run of a shape/config set and runs fully
# async once the persistent compile cache is warm.
_force_fence = False


@contextlib.contextmanager
def fenced_stages():
    """Force per-stage fences inside this context (first-run warm-up)."""
    global _force_fence
    prev = _force_fence
    _force_fence = True
    try:
        yield
    finally:
        _force_fence = prev


def device_fence() -> None:
    """True completion barrier: dispatch a trivial op and DOWNLOAD it.

    `jax.block_until_ready` is not an honest barrier through the axon
    tunnel (CLAUDE.md); the tunnel executes dispatches in order, so a
    value download completes only after all previously dispatched device
    work does — a global fence.  Costs one ~30ms sync; only for
    profiling (STITCH_FENCE_TIMERS=1)."""
    import jax.numpy as jnp
    float(jnp.zeros((), jnp.float32) + 1.0)


@contextlib.contextmanager
def stage_timer(name: str, times: Optional[StageTimes] = None,
                sync: object = None):
    """Time a pipeline stage; mirrors the LOGLN("<stage>, time: ...") lines."""
    start = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        # Block on whatever the stage put in the box (device arrays) so the
        # timing is honest under JAX's async dispatch.
        for v in box.values():
            try:
                jax.block_until_ready(v)
            except Exception:
                pass
        if _FENCE or _force_fence:
            try:
                device_fence()
            except Exception:
                pass
        elapsed = time.perf_counter() - start
        if times is not None:
            times[name] = times.get(name, 0.0) + elapsed
        logger.info("%s, time: %.6g sec", name, elapsed)
