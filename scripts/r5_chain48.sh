#!/bin/bash
# Round-5 TPU chain #48 (waits for chain47): decide the cache-cap default.
# chain46 showed IMBA_CACHE_CAP_MULT=2 on the r16 row = 30.36 dB @ 2527 ms
# vs the 5x default's 29.9 dB @ 3075 — better on BOTH axes.  BPT also lost
# 1 dB under the 5x default (fdd2470).  Measure cap2 on the remaining
# tracked quality rows; if none regresses, the default flips to 2.
#   1. bpt_org 30 s with cap2   (expect ~37 dB recovery vs 36.0)
#   2. cornell_vcm parity cap2  (baseline 26.02 dB @ 3020 ms, d6ab334)
#   3. cornell_water_vcm cap2   (parity row, baseline in r5_q_allnew_vcm*)
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain48.log
echo $$ > /tmp/chain48.pid
echo "=== chain48 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain47.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain47 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env IMBA_CACHE_CAP_MULT=2 IMBA_MERGE_DEFER=0 python tools/run_bench.py -t 30 \
    --only 'cornell_bpt_org$' -o results/r5_q_bptorg_cap2.csv
run env IMBA_CACHE_CAP_MULT=2 IMBA_MERGE_DEFER=0 python tools/run_bench.py -t 30 \
    --only 'cornell_vcm$' -o results/r5_q_vcm_cap2.csv
run env IMBA_CACHE_CAP_MULT=2 IMBA_MERGE_DEFER=0 python tools/run_bench.py -t 30 \
    --only 'cornell_water_vcm$' -o results/r5_q_water_cap2.csv

echo "=== chain48 done $(date) ===" >> $LOG
rm -f /tmp/chain48.pid
