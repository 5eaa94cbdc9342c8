#!/bin/bash
# Round-4 TPU chain #17:
#   1. The IMBA_PRUNE=0 unpruned shade_rec control that chain15 missed
#      (appended to its script after bash had read past the line) —
#      full + no_interaction rows give the pruning fetch-cost delta
#      directly against the 48.6 ms pruned record.
#   2. bench_masked.py at the NEW defaults (mask prepass on, K=4) so
#      results/bench_masked.csv holds the winning combo (2.36x).
#   3. Chunk-first sort key scattered A/B (scripts/r4_chunkkey.py):
#      morton vs chunk at 24k / 264k tris, 262k scattered rays.
#   4. End-to-end 48k-tri PT frame A/B under both keys (bounce/shadow
#      batches route through closest/any_hit_sorted).
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain17.log
echo "=== chain17 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env IMBA_PRUNE=0 python scripts/r4_pt_split2.py

run python scripts/bench_masked.py

run python scripts/r4_chunkkey.py

run python scripts/bigscene_frame.py 4000 1024
run env IMBA_SORT_KEY=chunk python scripts/bigscene_frame.py 4000 1024

echo "=== chain17 done $(date) ===" >> $LOG
