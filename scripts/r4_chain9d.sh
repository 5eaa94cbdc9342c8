#!/bin/bash
# Round-4 TPU chain #9d: validate the masked band cap end-to-end by
# re-running the four bench rows that crashed the remote compile
# (bench_r4.csv error rows + the 512^2 diagnostic).  Waits for chain9c.
cd /root/repo
mkdir -p results
LOG=results/r4_chain9d.log
echo "=== chain9d start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain9c.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/run_bench.py -t 30 --only 'still_life_bpt_512$' \
    -o results/r4_fix_slbpt512.csv
run python tools/run_bench.py -t 30 --only 'still_life_bpt_1080p$' \
    -o results/r4_fix_slbpt1080.csv
run python tools/run_bench.py -t 30 --only 'still_life_ppm_1M$' \
    -o results/r4_fix_slppm1m.csv

echo "=== chain9d done $(date) ===" >> $LOG
