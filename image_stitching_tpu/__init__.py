"""image_stitching_tpu — a TPU-native (JAX/XLA/Pallas) panorama stitching framework.

A ground-up rebuild of the capabilities of a1q123456/image_stitching
(reference mounted at /root/reference) designed TPU-first: batched static
shapes, vmap over images/pairs, Pallas kernels on the hot paths, and
jax.sharding meshes for scale-out. See SURVEY.md for the capability map.
"""

import jax as _jax

# Geometry (3x3 rotation chains, DLT solves, BA Jacobians) needs true f32
# matmuls; TPU defaults to bf16 inputs otherwise.  The hot image-plane ops
# opt into lower precision explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: stitch pipelines compile dozens of stage
# programs; caching makes warmup a one-time cost across processes.
try:
    import os as _os
    # Persistent cache for TPU only: XLA:CPU AOT artifacts carry host
    # machine-feature flags that can mis-execute when reloaded under a
    # different feature profile (observed as silently wrong results), and
    # CPU compiles are cheap anyway.
    # Check BOTH the env var and the config value: callers (tests, the
    # multi-chip dryrun) switch to CPU via jax.config.update before
    # importing this package, leaving the env var pointing at the TPU.
    # Only the PRIMARY (first) platform decides: the env may list a CPU
    # fallback after the TPU plugin ("axon,cpu"), which must not disable
    # the cache — a substring test did exactly that and silently turned
    # every process into a full recompile.
    _platforms = (_jax.config.jax_platforms or
                  _os.environ.get("JAX_PLATFORMS", "axon"))
    _primary = _platforms.split(",")[0].strip().lower()
    if _primary != "cpu":
        _cache = _os.environ.get(
            "IMAGE_STITCHING_TPU_CACHE",
            _os.path.expanduser("~/.cache/jax_stitch_tpu"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass

__version__ = "0.1.0"
