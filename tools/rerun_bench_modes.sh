#!/bin/bash
# Detect-affected chip re-runs after an ORB change. Same discipline as
# run_bench_modes.sh: one TPU process at a time, lockfile, per-mode
# logs; appends one JSON line per mode (tagged rerun window) to
# BENCH_MODES_r04.jsonl. NOTE: run with NO concurrent CPU load (pytest
# etc.) — the tunnel host-dispatch path is CPU-bound and contends.
set -u
cd /root/repo
touch /tmp/tpu_busy.lock
trap 'rm -f /tmp/tpu_busy.lock' EXIT
OUT=/root/repo/BENCH_MODES_r04.jsonl
for mode in "$@"; do
  echo "=== rerun $mode start $(date -u +%H:%M:%S) ===" >> /tmp/bench_modes.log
  BENCH_MODE=$mode timeout 2400 python bench.py \
      > /tmp/bench_${mode}.json 2> /tmp/bench_${mode}.log
  rc=$?
  if [ $rc -eq 0 ] && [ -s /tmp/bench_${mode}.json ]; then
    python - "$mode" <<'EOF' >> "$OUT"
import json, sys
rec = json.load(open(f"/tmp/bench_{sys.argv[1]}.json"))
rec["window"] = __import__("os").environ.get("BENCH_WINDOW", "rerun")
print(json.dumps(rec))
EOF
  else
    echo "{\"metric\": \"${mode}\", \"error\": \"exit ${rc}\", \"window\": \"rerun-${BENCH_WINDOW:-rerun}\"}" >> "$OUT"
  fi
  echo "=== rerun $mode done rc=$rc $(date -u +%H:%M:%S) ===" >> /tmp/bench_modes.log
done
echo RERUN_DONE >> /tmp/bench_modes.log
