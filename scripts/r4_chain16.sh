#!/bin/bash
# Round-4 TPU chain #16: masked-traversal prepass A/B (the "compacted
# re-dispatch" lever toward the <=2x opaque bar, VERDICT r3 item 4b).
#   IMBA_MASK_PREPASS=1 prepends a plain single-hit sorted dispatch:
#   tightest early-exit bound, every opaque-first lane resolves there,
#   only masked-out lanes enter the khit loop.  Measure at K=4 and K=2
#   (chain14 measures the K A/B WITHOUT the prepass; the winning combo
#   becomes the default and bench_masked.csv is left holding it).
# WAITS for chain15. Sequential, NO external timeouts (never kill a TPU
# client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain16.log
echo "=== chain16 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain15.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain15 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env IMBA_MASK_PREPASS=1 python scripts/bench_masked.py
run env IMBA_MASK_PREPASS=1 IMBA_KHIT_K=2 python scripts/bench_masked.py

echo "=== chain16 done $(date) ===" >> $LOG
