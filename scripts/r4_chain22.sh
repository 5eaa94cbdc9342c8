#!/bin/bash
# Round-4 TPU chain #22: post-specialization VCM frame-cost split.
# The 30 s VCM quality row (25.59 dB, r4_spec_q_vcm.csv) is purely
# frame-time-limited (3.3 s/frame -> 10 samples); the last VCM split
# (docs/vcm_perf.md) predates kind specialization, the lpc caps and the
# shade_rec pruning.  Re-split under current defaults to name the next
# lever (round-5 input if it doesn't land this round).
# Trimmed to 5 variants (r4_vcmsplit.py): remote compiles are not
# cached, each subset is a fresh ~10 min VCM megastep compile.
# Waits for chain21 (never overlap TPU clients; never kill mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain22.log
echo "=== chain22 queued $(date) ===" >> $LOG

while kill -0 $(cat /tmp/chain21.pid) 2>/dev/null; do sleep 30; done
echo "=== chain22 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r4_vcmsplit.py

echo "=== chain22 done $(date) ===" >> $LOG
