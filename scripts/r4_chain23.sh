#!/bin/bash
# Round-4 TPU chain #23: refresh the three still_life proxy rows that
# predate the narrow mask record (499d536) + shade_rec pruning — the
# scene has masked foliage, so the record applies.  Same invocations
# as chain9d (r4_fix_* rows being superseded).
# Waits for chain22 (never overlap TPU clients; never kill mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain23.log
echo "=== chain23 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain22.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain23 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/run_bench.py -t 30 --only 'still_life_bpt_512$' \
    -o results/r4_final_slbpt512.csv
run python tools/run_bench.py -t 30 --only 'still_life_bpt_1080p$' \
    -o results/r4_final_slbpt1080.csv
run python tools/run_bench.py -t 30 --only 'still_life_ppm_1M$' \
    -o results/r4_final_slppm1m.csv

echo "=== chain23 done $(date) ===" >> $LOG
