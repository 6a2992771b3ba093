"""Split the mosaic100 'Pairwise matching' stage wall on the real TPU.

The stage timer covers three distinct costs (stitcher.py:264-375):
  detect   orb_detect_stack on 100 VGA grays at K=4000 — dispatched in
           'Finding features' (0.00 s wall) but COMPUTED here, at the
           first dependent sync
  match    match_all_pairs over the 297 range-width-3 pairs
  fetch    the ONE packed download of (P, K) tables + fstack.xy

Times each separately with honest sync (fresh content per rep; clock
stops on a value download — CLAUDE.md).  Run: python
tools/exp_mosaic_match_split.py  (real TPU, no concurrent CPU load).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402
from image_stitching_tpu.ops.features.orb import orb_detect_stack  # noqa: E402
from image_stitching_tpu.ops.matching import match_all_pairs  # noqa: E402
from image_stitching_tpu.pipeline.stitcher import fetch_tree  # noqa: E402

N, H, W, K = 100, 480, 640, 4000
RANGE = 3
REPS = 3


def sync(x):
    return float(np.ravel(np.asarray(x))[0])


def main():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (N, H, W)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    # Warm-up compiles on content twin.
    g0 = jnp.asarray(base + 0.5)
    f0 = orb_detect_stack(g0, n_features=K)
    pm0 = match_all_pairs(f0, key, range_width=RANGE, pair_cap=K)
    fetch_tree((pm0, f0.xy))

    for rep in range(REPS):
        gray = jnp.asarray(base + float(rep + 1))
        sync(gray[0, 0, 0])  # upload done

        t0 = time.perf_counter()
        f = orb_detect_stack(gray, n_features=K)
        sync(f.xy[0, 0, 0])
        t1 = time.perf_counter()
        pm = match_all_pairs(f, key, range_width=RANGE, pair_cap=K)
        sync(pm.confidence[0, 1])
        t2 = time.perf_counter()
        host = fetch_tree((pm, f.xy))
        t3 = time.perf_counter()
        nbytes = sum(np.asarray(x).nbytes
                     for x in jax.tree.leaves(host))
        print(f"rep{rep}: detect {t1 - t0:6.2f}s  match {t2 - t1:6.2f}s  "
              f"fetch {t3 - t2:6.2f}s ({nbytes / 1e6:.1f} MB)",
              flush=True)


if __name__ == "__main__":
    main()
