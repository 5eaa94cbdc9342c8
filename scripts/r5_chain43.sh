#!/bin/bash
# Round-5 TPU chain #43: merge union-walk A/B.
#   1. r5_merge_union_ab probe: true dispatch cost union vs per-combo
#      (CPU interpret: 9.4 vs 18.6 ms, sums bitwise).
#   2. still_life ppm_1M refresh (the biggest merge workload; last
#      27.0 s/frame under the BLKQ flip).
# WAITS for chain42.  Sequential, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r5_chain43.log
echo "=== chain43 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain42.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain42 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r5_merge_union_ab.py
run python tools/run_bench.py -t 30 --only 'still_life_ppm_1M$' \
    -o results/r5_slppm1m_union.csv

echo "=== chain43 done $(date) ===" >> $LOG
