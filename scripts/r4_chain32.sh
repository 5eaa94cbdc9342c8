#!/bin/bash
# Round-4 TPU chain #32: A/B the merge fixes (fused combo loop, scatter
# inv_perm, sort-method searchsorted) + BLKQ sweep via r5_merge_split2.
# Waits for chain31; sequential, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r4_chain32.log
echo "=== chain32 queued $(date) ===" >> $LOG
while kill -0 "$(cat /tmp/chain31.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo "=== chain32 start $(date) ===" >> $LOG
run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}
run python scripts/r5_merge_split2.py
echo "=== chain32 done $(date) ===" >> $LOG
