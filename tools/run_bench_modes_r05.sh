#!/bin/bash
# Round-5 chip-run ledger: modes passed as args (default: all),
# sequentially, one TPU process at a time (CLAUDE.md tunnel discipline).
# Appends one JSON line per mode (commit-tagged) to BENCH_MODES_r05.jsonl;
# stderr per mode to /tmp/bench_<mode>.log.  One retry per mode: the
# axon lease can be stuck ~20 min after a killed process.
set -u
cd /root/repo
touch /tmp/tpu_busy.lock
trap 'rm -f /tmp/tpu_busy.lock' EXIT
OUT=/root/repo/BENCH_MODES_r05.jsonl
COMMIT=$(git rev-parse --short HEAD)
MODES=${@:-"vga_pair cyl4 rig37 mosaic100 e2e pairs spher16 gigapixel"}
for mode in $MODES; do
  for attempt in 1 2; do
    echo "=== $mode attempt $attempt start $(date -u +%H:%M:%S) ===" >> /tmp/bench_modes_r05.log
    BENCH_MODE=$mode timeout 7200 python bench.py \
        > /tmp/bench_${mode}.json 2> /tmp/bench_${mode}.log
    rc=$?
    echo "=== $mode attempt $attempt done rc=$rc $(date -u +%H:%M:%S) ===" >> /tmp/bench_modes_r05.log
    [ $rc -eq 0 ] && [ -s /tmp/bench_${mode}.json ] && break
    sleep 300
  done
  if [ $rc -eq 0 ] && [ -s /tmp/bench_${mode}.json ]; then
    python - "$mode" "$COMMIT" <<'EOF' >> "$OUT"
import json, sys
rec = json.load(open(f"/tmp/bench_{sys.argv[1]}.json"))
rec["commit"] = sys.argv[2]
print(json.dumps(rec))
EOF
  else
    echo "{\"metric\": \"${mode}\", \"error\": \"exit ${rc}\", \"commit\": \"${COMMIT}\"}" >> "$OUT"
  fi
done
echo ALL_DONE >> /tmp/bench_modes_r05.log
