#!/bin/bash
# Round-4 TPU chain #29: split the VCM merge dispatch cost.
# chain28 showed frame time FLAT in radius (3302/3295/3311 ms at
# radius 1/2/4) => the photon walk is cheap; the per-dispatch fixed
# machinery (qrec build, two full-width sorts, permutation gathers,
# DMA floor) is the merge lever.  r5_merge_split.py times the real
# dispatch vs a tiny-radius grid to split fixed vs walk.
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain29.log
echo "=== chain29 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r5_merge_split.py

echo "=== chain29 done $(date) ===" >> $LOG
