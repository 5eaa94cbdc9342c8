#!/bin/bash
# Round-4 TPU chain #20: masked frame-level cost split (closest vs
# shadow shares + isolated alpha_fn gather chain) — decides which of
# the two masked levers to build: the narrow per-tri mask record
# (fewer gathers per alpha test) or a dedicated masked occlusion loop
# (any_hit without the full masked-closest machinery).
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain20.log
echo "=== chain20 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r4_maskcost.py

echo "=== chain20 done $(date) ===" >> $LOG
