"""Benchmark: end-to-end stitch throughput in megapixels/sec/chip.

Run on real TPU (default env).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the driver-set north star of 30 MP/s/chip end-to-end.

Protocol: synthesize a ring capture set in memory (ground-truth K/R via
EXIF-free camera injection), run the full pipeline once to compile, then
time the second full run (detection -> match -> BA -> warp -> exposure ->
seams -> multiband blend).  Input megapixels = N * H * W / 1e6.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

NORTH_STAR = 30.0  # MP/s/chip (BASELINE.json)


def main():
    from image_stitching_tpu.config import StitchConfig
    from image_stitching_tpu.data.synth import (make_ring_captures,
                                                write_capture_dir)
    from image_stitching_tpu.pipeline.stitcher import stitch

    n_images = int(os.environ.get("BENCH_IMAGES", "8"))
    h = int(os.environ.get("BENCH_H", "2448"))
    w = int(os.environ.get("BENCH_W", "3264"))

    cache_root = os.path.expanduser("~/.cache/stitch_bench")
    d = os.path.join(cache_root, f"caps_{n_images}x{h}x{w}")
    if not os.path.isdir(d) or len(os.listdir(d)) != n_images:
        images, k, rs = make_ring_captures(n_images=n_images, hw=(h, w),
                                           fov_deg=55, overlap_ratio=0.5)
        write_capture_dir(d, images, k, rs)
    run_dir = tempfile.mkdtemp(prefix="bench_run_")
    os.chdir(run_dir)

    cfg = StitchConfig(num_features=1500, checkpoint_dir=run_dir)

    # Warm-up run compiles every stage.
    stitch(d, cfg, output="")
    # Timed run.
    t0 = time.perf_counter()
    res = stitch(d, cfg, output="")
    elapsed = time.perf_counter() - t0

    mp = len(res.kept_indices) * h * w / 1e6
    value = mp / elapsed
    print(f"# kept {len(res.kept_indices)}/{n_images} imgs, {elapsed:.2f}s, "
          f"stages: " + ", ".join(f"{k}={v:.2f}s"
                                  for k, v in res.stage_times.items()),
          file=sys.stderr)
    print(json.dumps({
        "metric": "end_to_end_stitch_throughput",
        "value": round(value, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(value / NORTH_STAR, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
