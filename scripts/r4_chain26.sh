#!/bin/bash
# Round-4 TPU chain #26: re-record the judged masked bench
# (results/bench_masked.csv) under the FINAL defaults — narrow mask
# record + khit K=4 + prepass OFF (a18d6d6), no hoist — expected
# ~2825 ms masked vs ~1815 opaque = 1.56x.
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain26.log
echo "=== chain26 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain25.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "=== chain26 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/bench_masked.py

echo "=== chain26 done $(date) ===" >> $LOG
