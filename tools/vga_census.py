"""Host<->device round-trip census for the 2-image VGA stitch
(BASELINE config 1 / bench.py vga_pair — VERDICT r05 item 8).

The vga_pair p50 has spread 423-823 ms across windows with the latency
story resting on "tunnel floor" prose.  This instruments every
device->host transfer the stitch makes (`core.transfer.fetch_tree` — the
pipeline's single packed-download funnel — plus raw `np.asarray`
downloads via a jax.Array monkeypatch is not possible, so any remaining
direct downloads are counted through a profiling wrapper on
`jax.device_get`) and every host->device upload (`jnp.asarray` /
`jax.device_put` of numpy arrays via `jax.device_put` wrapper), then
prints a per-call ledger: caller site, bytes, milliseconds.

Run on the real TPU, no concurrent CPU load:
    python tools/vga_census.py [n_runs]
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEDGER = []


def _caller():
    for fr in reversed(traceback.extract_stack()[:-2]):
        fn = fr.filename
        if "image_stitching_tpu" in fn and "core/transfer" not in fn:
            return f"{os.path.basename(fn)}:{fr.lineno} {fr.name}"
    return "?"


def _nbytes(tree):
    import jax
    tot = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "nbytes"):
            tot += int(leaf.nbytes)
    return tot


def install():
    import jax
    from image_stitching_tpu.core import transfer
    from image_stitching_tpu.pipeline import stitcher

    real_fetch = transfer.fetch_tree

    from image_stitching_tpu.core.logging import device_fence
    fence = os.environ.get("CENSUS_FENCE", "0") == "1"

    def counted_fetch(tree):
        t0 = time.perf_counter()
        if fence:
            device_fence()      # drain: waits for all dispatched work
        t1 = time.perf_counter()
        out = real_fetch(tree)
        t2 = time.perf_counter()
        extra = f" [drain {1e3*(t1-t0):.0f} + xfer {1e3*(t2-t1):.0f} ms]"             if fence else ""
        LEDGER.append(("d2h.fetch_tree", _caller() + extra,
                       _nbytes(out), t2 - t0))
        return out

    transfer.fetch_tree = counted_fetch
    stitcher.fetch_tree = counted_fetch
    # compose_fused and exposure import fetch_tree lazily from
    # core.transfer inside functions, so the module patch covers them.

    real_get = jax.device_get

    def counted_get(x):
        t0 = time.perf_counter()
        out = real_get(x)
        LEDGER.append(("d2h.device_get", _caller(), _nbytes(out),
                       time.perf_counter() - t0))
        return out

    jax.device_get = counted_get

    real_put = jax.device_put

    def counted_put(x, *a, **kw):
        t0 = time.perf_counter()
        out = real_put(x, *a, **kw)
        LEDGER.append(("h2d.device_put", _caller(), _nbytes(x),
                       time.perf_counter() - t0))
        return out

    jax.device_put = counted_put

    # Split BA into phases: problem upload+dispatch vs the params fetch.
    import importlib
    ba_mod = importlib.import_module(
        "image_stitching_tpu.estimation.bundle_adjust")
    real_lm = ba_mod._lm_solve_device

    def counted_lm(*a, **kw):
        t0 = time.perf_counter()
        out = real_lm(*a, **kw)
        LEDGER.append(("ba.lm_dispatch", "bundle_adjust._lm_solve_device",
                       0, time.perf_counter() - t0))
        return out

    ba_mod._lm_solve_device = counted_lm

    # Time the other device touchpoints between match fetch and BA fetch.
    real_pack = ba_mod.pack_correspondences
    def counted_pack(*a, **kw):
        t0 = time.perf_counter()
        out = real_pack(*a, **kw)
        if fence:
            device_fence()
        LEDGER.append(("ba.pack", "pack_correspondences", 0,
                       time.perf_counter() - t0))
        return out
    ba_mod.pack_correspondences = counted_pack
    stitcher.pack_correspondences = counted_pack

    real_pfc = ba_mod._params_from_cameras
    def counted_pfc(*a, **kw):
        t0 = time.perf_counter()
        out = real_pfc(*a, **kw)
        if fence:
            device_fence()
        LEDGER.append(("ba.params", "_params_from_cameras", 0,
                       time.perf_counter() - t0))
        return out
    ba_mod._params_from_cameras = counted_pfc


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import tempfile

    import image_stitching_tpu  # noqa: F401 (compile cache setup)
    from image_stitching_tpu.config import StitchConfig
    from image_stitching_tpu.data.synth import (make_ring_captures,
                                                write_capture_dir)
    from image_stitching_tpu.pipeline.stitcher import stitch

    cache_root = os.path.expanduser("~/.cache/stitch_bench")
    dirs = []
    for seed in range(n_runs + 1):
        d = os.path.join(cache_root, f"vga2_s{seed}")
        if not os.path.isdir(d):
            images, k, rs = make_ring_captures(
                n_images=2, hw=(480, 640), fov_deg=55,
                overlap_ratio=0.5, seed=100 + seed)
            write_capture_dir(d, images, k, rs)
        dirs.append(d)
    run_dir = tempfile.mkdtemp(prefix="census_vga_")
    os.chdir(run_dir)
    cfg = StitchConfig(num_features=1500, blend_type="feather",
                       checkpoint_dir=run_dir)
    stitch(dirs[0], cfg, output="")  # warm compiles
    install()
    for i, d in enumerate(dirs[1:]):
        LEDGER.append(("run.start", d, 0, 0.0))
        t0 = time.perf_counter()
        stitch(d, cfg, output="")
        LEDGER.append(("run.end", d, 0, time.perf_counter() - t0))

    runs = []
    cur = None
    for kind, where, nb, dt in LEDGER:
        if kind == "run.start":
            cur = {"calls": [], "total": None}
            runs.append(cur)
        elif kind == "run.end":
            cur["total"] = dt
        elif cur is not None:
            cur["calls"].append((kind, where, nb, dt))
    for i, r in enumerate(runs):
        sync_ms = sum(dt for _, _, _, dt in r["calls"]) * 1e3
        print(f"\n== run {i}: total {r['total']*1e3:.1f} ms, "
              f"{len(r['calls'])} transfers, {sync_ms:.1f} ms in "
              f"transfers ==")
        for kind, where, nb, dt in r["calls"]:
            print(f"  {dt*1e3:7.1f} ms  {nb/1e3:9.1f} kB  {kind:16s} "
                  f"{where}")
    tot = np.array([r["total"] for r in runs]) * 1e3
    print(f"\np50 total {np.percentile(tot, 50):.1f} ms over {len(runs)} "
          f"runs; transfer counts "
          f"{[len(r['calls']) for r in runs]}")


if __name__ == "__main__":
    main()
