#!/bin/bash
# Round-5 TPU chain #52 (waits for chain51): masked closest-hit frame
# attribution (VERDICT r4 item 6 — the unexplained +2207 ms frame carry
# vs +243 shadow at equal dispatch count, chains 19/20).
#   1. baseline masked/opaque frames (control, same session)
#   2. IMBA_MASK_STATIC_ROUNDS=1: while_loop -> 1-round fori.  If the
#      frame collapses toward opaque+450 ms, the while STRUCTURE
#      (fusion barrier / scheduling) is the carry; if it stays high,
#      the khit dispatches themselves are.
#   3. IMBA_MASK_STATIC_ROUNDS=2: rounds-count sensitivity.
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain52.log
echo $$ > /tmp/chain52.pid
echo "=== chain52 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain58.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain58 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/bench_masked.py
run env IMBA_MASK_STATIC_ROUNDS=1 python scripts/bench_masked.py
run env IMBA_MASK_STATIC_ROUNDS=2 python scripts/bench_masked.py

echo "=== chain52 done $(date) ===" >> $LOG
rm -f /tmp/chain52.pid
