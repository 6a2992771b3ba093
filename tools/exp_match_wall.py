"""Dissect the pairwise-matching stage wall on the real TPU.

The e2e bench records Matching at 0.37-0.52 s for 28 pairs while the
batched-pairs bench sustains ~420 pairs/s (~2.4 ms/pair) — an order of
magnitude gap.  Hypotheses: (a) the stage sync drains detect programs
queued by the Features stage (stage walls are wall-clock deltas, so
whichever stage syncs first absorbs the async queue); (b) the
match_all_pairs program itself is slow at N=8/K=1500 shapes; (c) the
packed PairMatches download.

This probe times match_all_pairs ALONE: features pre-computed and
synced, fresh descriptor content per rep, clock stopped on the packed
fetch_tree download (honest per CLAUDE.md).

Run: python tools/exp_match_wall.py     # real TPU
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import image_stitching_tpu  # noqa: F401,E402
from image_stitching_tpu.core.transfer import fetch_tree  # noqa: E402
from image_stitching_tpu.ops.features import Features  # noqa: E402
from image_stitching_tpu.ops.matching import match_all_pairs  # noqa: E402


def main():
    n, h, w = 8, 1224, 1632   # bench work-scale shapes (half of 8 MP)
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (n, h, w)).astype(np.float32)

    def feats_for(shift: float) -> Features:
        stack = jnp.asarray(base + shift, jnp.float32)
        from image_stitching_tpu.ops.features.orb import orb_detect_stack
        return orb_detect_stack(stack.astype(jnp.uint8), n_features=1500)

    key = jax.random.PRNGKey(0)

    def run(shift: float):
        return fetch_tree(match_all_pairs(feats_for(shift), key,
                                          match_conf=0.3))

    # Warm-up compiles.
    run(0.0)

    # (1) detect+match+download together (what the e2e stages absorb).
    ts_all = []
    for r in range(4):
        t0 = time.perf_counter()
        run(float(r + 1))
        ts_all.append(time.perf_counter() - t0)

    # (2) match+download alone: features synced to host first, re-fed as
    # fresh device arrays, and the uploads DRAINED before the clock
    # starts (uploads serialize with device compute through the tunnel,
    # so an un-synced upload would inflate the isolated match number).
    ts_match = []
    for r in range(4):
        f = feats_for(float(10 + r))
        f_host = jax.tree.map(np.asarray, f)          # sync + host copy
        f_dev = jax.tree.map(jnp.asarray, f_host)     # fresh upload
        float(jnp.ravel(f_dev.xy)[0])                 # drain the uploads
        t0 = time.perf_counter()
        pm = match_all_pairs(f_dev, key, match_conf=0.3)
        fetch_tree(pm)
        ts_match.append(time.perf_counter() - t0)

    print(f"detect+match+dl : {np.median(ts_all)*1e3:7.1f} ms  "
          f"(runs {', '.join(f'{t*1e3:.0f}' for t in ts_all)})")
    print(f"match+dl alone  : {np.median(ts_match)*1e3:7.1f} ms  "
          f"(runs {', '.join(f'{t*1e3:.0f}' for t in ts_match)})")


if __name__ == "__main__":
    main()
