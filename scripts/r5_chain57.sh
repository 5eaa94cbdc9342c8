#!/bin/bash
# Round-5 TPU chain #57 (waits for chain54): re-measure the tracked
# quality rows under the FINAL cache policy (collect-then-select,
# light_cache.select_shallowest).  chain54's rows ran the intermediate
# per-path admission (r16 29.98 dB — left capacity unused) and its
# bpt/water rows were CPU-contended; selection reproduces the measured
# global-truncation set bitwise on single-band configs, so the
# expectation is r16 == 30.36 dB.  HOST MUST BE QUIET.
cd /root/repo
mkdir -p results
LOG=results/r5_chain57.log
echo $$ > /tmp/chain57.pid
echo "=== chain57 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain54.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain54 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/run_bench.py -t 30 --only 'cornell_vcm_r16$' \
    -o results/r5_sel_r16.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    -o results/r5_sel_vcm.csv
run python tools/run_bench.py -t 30 --only 'cornell_bpt_org$' \
    -o results/r5_sel_bptorg.csv
run python tools/run_bench.py -t 30 --only 'cornell_water_vcm$' \
    -o results/r5_sel_water.csv

echo "=== chain57 done $(date) ===" >> $LOG
rm -f /tmp/chain57.pid
