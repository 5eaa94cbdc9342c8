#!/bin/bash
# Round-4 TPU chain #19: masked-traversal dispatch-level cost split
# (scripts/r4_maskedsplit.py) — where does the canopy's 1.36x-over-
# opaque go: prepass/alpha machinery vs the khit round loop?
# WAITS for chain18.  Sequential, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r4_chain19.log
echo "=== chain19 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain18.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain18 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r4_maskedsplit.py

echo "=== chain19 done $(date) ===" >> $LOG
