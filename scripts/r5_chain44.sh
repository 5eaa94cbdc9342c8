#!/bin/bash
# Round-5 TPU chain #44 (post-restart consolidation of queued 42/43/40):
# validate the three landed-but-unmeasured defaults on TPU, most
# valuable first, then refresh the headline.
#   1. merge union-walk A/B (smoke test for the new merge kernel +
#      true dispatch cost; CPU interpret said 9.4 vs 18.6 ms).
#   2. cornell_vcm_r8 30 s quality row — the 30 dB candidate (radius
#      knee 28.9 dB at old frame cost; union+sort+flush must buy the
#      rest through more frames in budget).
#   3. cornell_vcm 30 s parity row (radius 2.0) under all new defaults.
#   4. cornell_bpt_org 30 s row (flush append touches the light pass).
#   5. bench.py headline confirm (should hold ~110 Mrays/s).
#   6. vmem octant-sort + flush-append probe (attribution).
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain44.log
echo "=== chain44 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r5_merge_union_ab.py
run python tools/run_bench.py -t 30 --only 'cornell_vcm_r8$' \
    -o results/r5_q_allnew_vcmr8.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    -o results/r5_q_allnew_vcm.csv
run python tools/run_bench.py -t 30 --only 'cornell_bpt_org$' \
    -o results/r5_q_allnew_bpt.csv
run python bench.py
run python scripts/r5_flush_sort_ab.py

echo "=== chain44 done $(date) ===" >> $LOG
