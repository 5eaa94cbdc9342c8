#!/bin/bash
# Round-5 TPU chain #46 (waits for chain45): attribute the quality-row
# frame regression under the new defaults (vcm_r8 3230 -> 3881 ms,
# r5_q_allnew_vcmr8.csv) and find the best 30 s config.
#   1. cornell_vcm_r16 with IMBA_VMEM_SORT=0 (is the octant vmem
#      pre-sort a loss on the quality row's dispatches?)
#   2. cornell_vcm_r16 with IMBA_CACHE_CAP_MULT=2 (is the no-truncation
#      cache the slowdown — more photons => more merge pairs — and is
#      its dB gain per frame worth the frame cost at 30 s?)
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain46.log
echo "=== chain46 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain45.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain45 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env IMBA_VMEM_SORT=0 python tools/run_bench.py -t 30 \
    --only 'cornell_vcm_r16$' -o results/r5_q_r16_nosort.csv
run env IMBA_CACHE_CAP_MULT=2 python tools/run_bench.py -t 30 \
    --only 'cornell_vcm_r16$' -o results/r5_q_r16_cap2.csv

echo "=== chain46 done $(date) ===" >> $LOG
