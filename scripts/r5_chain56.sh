#!/bin/bash
# Round-5 TPU chain #56 (waits for chain52): re-render the
# still_life_1080p_len10 golden — the chain50 render produced 4 frames
# in 951 s (half-vs-final rmse 0.147, unusable) because CPU-side pytest
# runs starved the TPU client's host thread during its window (the
# CLAUDE.md contention trap).  Host must be QUIET for this chain.
cd /root/repo
mkdir -p results goldens
LOG=results/r5_chain56.log
echo $$ > /tmp/chain56.pid
echo "=== chain56 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain52.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain52 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/render_golden.py still_life_1080p_len10 -t 900

echo "=== chain56 done $(date) ===" >> $LOG
rm -f /tmp/chain56.pid
