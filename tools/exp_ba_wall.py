"""Dissect the bundle-adjustment stage wall on the real TPU.

The e2e bench records BA at 0.25-0.32 s while the device program (25 LM
iterations over a <=4096-row bucketed table) should be ~10 ms of
compute.  This probe splits the stage into:

  host pack      pack_correspondences (numpy)
  upload+run     _lm_solve_device dispatch with fresh problem content
  download       the params fetch (the ~30 ms tunnel sync)

Honest timing per CLAUDE.md: fresh input content each rep; the clock
stops on the params download.

Run: python tools/exp_ba_wall.py     # real TPU
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402
from image_stitching_tpu.estimation.bundle_adjust import (  # noqa: E402
    _free_mask, _lm_solve_device, _params_from_cameras)
from image_stitching_tpu.geometry.camera import Cameras  # noqa: E402


def make_problem(n_cams: int, rows: int, seed: int):
    rng = np.random.default_rng(seed)
    cam_i = rng.integers(0, n_cams - 1, rows).astype(np.int32)
    cam_j = (cam_i + 1).astype(np.int32)
    p_i = rng.uniform(-300, 300, (rows, 2)).astype(np.float32)
    p_j = p_i + rng.normal(0, 1.0, (rows, 2)).astype(np.float32)
    w = np.ones(rows, np.float32)
    return cam_i, cam_j, p_i, p_j, w


def main():
    for n_cams, rows in ((2, 256), (8, 4096)):
        cams = Cameras.identity(n_cams, 700.0)
        params = _params_from_cameras(cams)
        free = jnp.asarray(_free_mask(n_cams, "_____"))
        cam_i, cam_j, p_i, p_j, w = make_problem(n_cams, rows, 0)

        def run(shift):
            out = _lm_solve_device(
                params, jnp.asarray(cam_i), jnp.asarray(cam_j),
                jnp.asarray(p_i + np.float32(shift)),
                jnp.asarray(p_j + np.float32(shift)),
                jnp.asarray(w), free, cost="reproj", n_cams=n_cams,
                max_iters=25, solver="chol")
            return np.asarray(out)

        run(0)  # compile
        ts = []
        for r in range(5):
            t0 = time.perf_counter()
            run(r + 1)
            ts.append(time.perf_counter() - t0)
        print(f"n={n_cams} rows={rows}: upload+run+download "
              f"{np.median(ts)*1e3:7.1f} ms  (runs "
              f"{', '.join(f'{t*1e3:.0f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
