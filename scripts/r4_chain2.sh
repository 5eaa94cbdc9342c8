#!/bin/bash
# Round-4 TPU measurement chain #2 (run after chain1):
# 1. profile_vcm_lpc re-run (chain1's run crashed on a mid-edit import
#    race -- NameError _connect_slice_rows; the module is consistent now).
# 2. bench.py -- the headline with one-dispatch fused frames
#    (pt.use_fused_frame, expected ~52 Mrays/s vs 24 banded).
# Sequential, one fresh process per entry, NO external timeouts
# (CLAUDE.md: killing a TPU client mid-claim wedges the pool).
cd /root/repo
mkdir -p results
LOG=results/r4_chain2.log
echo "=== chain2 start $(date) ===" >> $LOG
for s in profile_vcm_lpc; do
  echo "--- $s $(date) ---" >> $LOG
  python scripts/$s.py >> $LOG 2>&1
  echo "--- $s exit=$? $(date) ---" >> $LOG
done
echo "--- bench.py $(date) ---" >> $LOG
python bench.py > results/r4_bench_fused.json 2>> $LOG
echo "--- bench.py exit=$? $(date) ---" >> $LOG
cat results/r4_bench_fused.json >> $LOG
echo "=== chain2 done $(date) ===" >> $LOG
