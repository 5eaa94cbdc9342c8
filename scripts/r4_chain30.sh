#!/bin/bash
# Round-4 TPU chain #30: prep-vs-kernel merge split (r5_merge_split2).
# Waits for chain29; sequential, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r4_chain30.log
echo "=== chain30 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain29.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "=== chain30 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r5_merge_split2.py

echo "=== chain30 done $(date) ===" >> $LOG
