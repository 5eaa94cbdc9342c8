#!/bin/bash
# Round-5 TPU chain #58 (waits for chain55): confirm the tracked
# quality rows under the FINAL defaults + the single-band fast path
# (expected bitwise-equal to the chain46/48/49 truncation rows:
# r16 30.36 dB, parity 26.75, bpt_org 37.06).  HOST QUIET.
cd /root/repo
mkdir -p results
LOG=results/r5_chain58.log
echo $$ > /tmp/chain58.pid
echo "=== chain58 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain55.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain55 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/run_bench.py -t 30 --only 'cornell_vcm_r16$' \
    -o results/r5_final2_r16.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    -o results/r5_final2_vcm.csv
run python tools/run_bench.py -t 30 --only 'cornell_bpt_org$' \
    -o results/r5_final2_bptorg.csv

echo "=== chain58 done $(date) ===" >> $LOG
rm -f /tmp/chain58.pid
