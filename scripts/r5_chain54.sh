#!/bin/bash
# Round-5 TPU chain #54 (waits for chain51): closing sweep under the
# FINAL flipped defaults (cap2 / merge defer / shadow defer / dense2 —
# whatever is in code by now), the judge-facing quality-row record.
#   1. cornell_vcm_r16  (headline 30 s quality row)
#   2. cornell_vcm      (parity row)
#   3. cornell_bpt_org  (merge-free row)
#   4. cornell_water_vcm
#   5. bench.py + smoke_check (final headline under final defaults)
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain54.log
echo $$ > /tmp/chain54.pid
echo "=== chain54 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain51.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain51 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/run_bench.py -t 30 --only 'cornell_vcm_r16$' \
    -o results/r5_final_r16.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    -o results/r5_final_vcm.csv
run python tools/run_bench.py -t 30 --only 'cornell_bpt_org$' \
    -o results/r5_final_bptorg.csv
run python tools/run_bench.py -t 30 --only 'cornell_water_vcm$' \
    -o results/r5_final_water.csv
run python bench.py
run python scripts/smoke_check.py

echo "=== chain54 done $(date) ===" >> $LOG
rm -f /tmp/chain54.pid
