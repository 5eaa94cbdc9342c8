#!/bin/bash
# Round-4 TPU chain #27 (final): validate the octant-major sort-key
# default flip (chain25: scattered 1.52->2.35 Mrays/s @24k, 48k-tri
# frame 2614->2306 ms) on the paths it also touches, then record the
# final driver-facing numbers under ALL final defaults.
#   1. full pytest on CPU FIRST (machine must be quiet for TPU timing)
#   2. bench_masked.py — khit path also sorts by sort_keys; A/B vs the
#      chain26 morton row (2873.8 ms masked / 1811.2 opaque)
#   3. bench.py — final headline + bench_big/bench_1080p refresh
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain27.log
echo "=== chain27 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain26.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "=== chain27 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python -m pytest tests/ -q
run python scripts/bench_masked.py
run python bench.py

echo "=== chain27 done $(date) ===" >> $LOG
