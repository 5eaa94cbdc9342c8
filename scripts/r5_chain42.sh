#!/bin/bash
# Round-5 TPU chain #42: land the light-pass levers.
#   1. r5_flush_sort_ab probe: vmem octant pre-sort A/B (closest
#      coherent/scattered, any_hit) + one-flush append A/B.
#   2. 30 s quality rows under the new defaults (cache cap 5x lpc,
#      flush append, vmem sort): cornell_vcm, cornell_bpt_org,
#      cornell_vcm_r8 (tuned radius — the 30 dB candidate).
#   3. Capacity isolation control: cornell_vcm with the old 2x cap.
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain42.log
echo "=== chain42 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r5_flush_sort_ab.py

run python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    -o results/r5_q_capflush_vcm.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm_r8$' \
    -o results/r5_q_capflush_vcmr8.csv
run python tools/run_bench.py -t 30 --only 'cornell_bpt_org$' \
    -o results/r5_q_capflush_bpt.csv
run env IMBA_CACHE_CAP_MULT=2 python tools/run_bench.py -t 30 \
    --only 'cornell_vcm$' -o results/r5_q_cap2_vcm.csv

echo "=== chain42 done $(date) ===" >> $LOG
