#!/bin/bash
# Round-4 TPU chain #21: masked-traversal levers under the new narrow
# mask record (two-gather alpha test, commit 499d536).
#   1. bench_masked.py — the headline masked/opaque ratio A/B against
#      chain17's 2.36x (4271 vs 1812 ms, old 6-gather alpha chain).
#   2. r4_maskcost.py — frame shadow/closest shares + isolated alpha_fn
#      cost under the record (expect ~5.3 -> ~2 ms/M lanes).
#   3-6. r4_maskframe.py knob sweep (fresh process each; knobs are
#      read at import): prepass-only (khit-loop share), khit-only
#      (prepass share), K=8 (round count vs kernel cost), per-layer
#      path control.
#   7. old-alpha control for maskcost's alpha probe (IMBA_MASK_REC=0).
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain21.log
echo "=== chain21 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/bench_masked.py
run python scripts/r4_maskcost.py
run env IMBA_MASK_MAX_ROUNDS=0 python scripts/r4_maskframe.py
run env IMBA_MASK_PREPASS=0 python scripts/r4_maskframe.py
run env IMBA_KHIT_K=8 python scripts/r4_maskframe.py
run env IMBA_MASK_KHIT=0 python scripts/r4_maskframe.py

echo "=== chain21 done $(date) ===" >> $LOG
