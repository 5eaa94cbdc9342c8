#!/bin/bash
# Round-4 TPU chain #25: octant-major sort key for scattered batches
# (pallas_stream.sort_keys, IMBA_SORT_KEY=octant).  Hypothesis: the
# scattered-ray stream kernel's early-exit bound is dead under the
# position-major Morton key because blocks mix all 8 direction octants
# and no candidate ordering is front-to-back for the whole block;
# octant-major restores per-block directional coherence at identical
# sort cost.
#   1. r4_chunkkey.py — morton vs octant, 262k scattered rays at
#      24k/264k tris (slope timing, one process).
#   2/3. 48k-tri PT frame A/B (bigscene_frame.py) — bounce/shadow
#      batches route through the sorted dispatches end-to-end.
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain25.log
echo "=== chain25 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain24.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "=== chain25 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r4_chunkkey.py
run python scripts/bigscene_frame.py 4000 1024
run env IMBA_SORT_KEY=octant python scripts/bigscene_frame.py 4000 1024

echo "=== chain25 done $(date) ===" >> $LOG
