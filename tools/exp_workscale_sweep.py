"""Work-scale sweep on the real chip (VERDICT r02 item 1).

Runs bench.py e2e at BENCH_WORK_MP in {full, 6, 4, 3, 2} sequentially
(one TPU process at a time) and records (MP/s best, MP/s p50, reproj px,
stage walls) per point.  The decision rule: ship the smallest work scale
whose mean pairwise reprojection error stays <= 1 px.

Usage:  python tools/exp_workscale_sweep.py [out.json]
"""

import json
import os
import subprocess
import sys

POINTS = [-1.0, 6.0, 4.0, 3.0, 2.0]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "workscale_sweep.json"
    out_path = os.path.abspath(out_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    points = [float(p) for p in os.environ["WS_POINTS"].split(",")] \
        if os.environ.get("WS_POINTS") else POINTS
    results = []
    if os.path.exists(out_path):  # resume: merge, skip measured points
        with open(out_path) as f:
            results = json.load(f)
        done = {r.get("work_mp") for r in results if "error" not in r}
        points = [p for p in points if p not in done]
    for wm in points:
        env = dict(os.environ)
        env["BENCH_MODE"] = "e2e"
        env["BENCH_WORK_MP"] = str(wm)
        print(f"=== BENCH_WORK_MP={wm} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            env=env, capture_output=True, text=True, timeout=3600)
        sys.stderr.write(proc.stderr)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            rec = {"error": proc.stdout[-500:] + proc.stderr[-500:]}
        rec["work_mp"] = wm
        # stage walls from stderr diagnostics
        for ln in proc.stderr.splitlines():
            if ln.startswith("# kept") or ln.startswith("# runs"):
                rec.setdefault("diag", []).append(ln)
        results.append(rec)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(rec), flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
