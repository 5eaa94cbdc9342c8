#!/bin/bash
# Round-4 TPU chain #14b: remainder of chain14 after the host restart.
# Item 1 (2188-row take crossover controls) already landed in
# r4_slice_ab.txt + commit 55bf103; this runs the rest:
#   2. khit K A/B on the masked canopy (K=4 default vs K=2).
#   3. The spec 30 s quality rows chain11's --only missed.
#   4. Final headline record for the round.
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain14.log
echo "=== chain14b start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 2. khit K A/B (canopy, writes bench_masked.csv; stdout keeps both).
run python scripts/bench_masked.py
run env IMBA_KHIT_K=2 python scripts/bench_masked.py

# 3. Spec quality rows (PSNR parity vs bench_r4.csv / chain8).
run python tools/run_bench.py -t 30 --only 'cornell_pt$' \
    -o results/r4_spec_q_pt.csv
run python tools/run_bench.py -t 30 --only 'cornell_bpt_org$' \
    -o results/r4_spec_q_bpt.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    -o results/r4_spec_q_vcm.csv

# 4. Final headline record.
run python bench.py

echo "=== chain14b done $(date) ===" >> $LOG
