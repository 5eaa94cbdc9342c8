#!/bin/bash
# Round-4 TPU chain #31: VCM light_hit floor split (r5_floor_split).
# Waits for chain30; sequential, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r4_chain31.log
echo "=== chain31 queued $(date) ===" >> $LOG
while kill -0 "$(cat /tmp/chain30.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo "=== chain31 start $(date) ===" >> $LOG
run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}
run python scripts/r5_floor_split.py
echo "=== chain31 done $(date) ===" >> $LOG
