#!/bin/bash
# Round-4 TPU chain #15: where does the post-specialization headline
# frame (56.3 ms) spend its time?
#   1. Full ablation split under the CURRENT defaults (spec + take=mxu):
#      the only post-spec shares known are full/no_interaction; the
#      no_nee / no_shadow / no_emit / trace_only rows still date from the
#      pre-spec gather run and no longer describe the program.
#   2. select-tier re-check: the kind-specialized bounce program is much
#      smaller, which may move the 36-row select-vs-mxu crossover
#      (pre-spec: select 93.2 vs mxu 88.2 ms).
# WAITS for chain14. Sequential, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r4_chain15.log
echo "=== chain15 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain14.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain14 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env IMBA_SPLIT_ALL=1 python scripts/r4_pt_split2.py
run env IMBA_TAKE=select python scripts/r4_pt_split2.py

#   3. shade_rec column-pruning A/B (commit a7a3f59): the runs above use
#      the pruned record (48 -> 22 cols on cornell-org); this is the
#      same-session unpruned control (full + no_interaction rows give
#      the fetch-cost delta directly).
run env IMBA_PRUNE=0 python scripts/r4_pt_split2.py

echo "=== chain15 done $(date) ===" >> $LOG
