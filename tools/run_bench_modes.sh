#!/bin/bash
# Chip-run ledger: every bench mode, sequentially, one TPU process at a
# time (CLAUDE.md tunnel discipline).  Appends one JSON line per mode to
# BENCH_MODES_r04.jsonl; stderr per mode to /tmp/bench_<mode>.log.
set -u
cd /root/repo
touch /tmp/tpu_busy.lock
trap 'rm -f /tmp/tpu_busy.lock' EXIT
OUT=/root/repo/BENCH_MODES_r04.jsonl
: > "$OUT"
for mode in vga_pair cyl4 rig37 mosaic100 e2e pairs gigapixel; do
  echo "=== $mode start $(date -u +%H:%M:%S) ===" >> /tmp/bench_modes.log
  BENCH_MODE=$mode timeout 3600 python bench.py \
      > /tmp/bench_${mode}.json 2> /tmp/bench_${mode}.log
  rc=$?
  if [ $rc -eq 0 ] && [ -s /tmp/bench_${mode}.json ]; then
    cat /tmp/bench_${mode}.json >> "$OUT"
  else
    echo "{\"metric\": \"${mode}\", \"error\": \"exit ${rc}\"}" >> "$OUT"
  fi
  echo "=== $mode done rc=$rc $(date -u +%H:%M:%S) ===" >> /tmp/bench_modes.log
done
echo ALL_DONE >> /tmp/bench_modes.log
