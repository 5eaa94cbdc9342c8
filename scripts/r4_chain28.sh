#!/bin/bash
# Round-4 TPU chain #28: first measurement of the named VCM lever.
# chain22 split the quality-row frame: merge carries +1224 ms of 3313
# (37%, dominant technique).  Merge join cost scales with the pair
# count ~ radius^2; quality trades merge noise-reduction vs frames per
# 30 s.  One-knob sweep: radius_factor on the cornell_vcm 30 s row
# (reference bench default 2.0, cmd_line.h:70).
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain28.log
echo "=== chain28 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain27.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "=== chain28 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
  --sweep radius_factor=1.0,2.0,4.0 -o results/r4_radius_sweep.csv

echo "=== chain28 done $(date) ===" >> $LOG
