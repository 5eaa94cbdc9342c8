#!/bin/bash
# Round-5 TPU chain #61 (waits for chain60): the remaining DEFAULT_RUNS
# 30 s rows under final defaults (judge row sweep completeness).
cd /root/repo
mkdir -p results
LOG=results/r5_chain61.log
echo $$ > /tmp/chain61.pid
echo "=== chain61 queued $(date) ===" >> $LOG
while kill -0 "$(cat /tmp/chain60.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain60 done, starting $(date) ===" >> $LOG
run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}
run python tools/run_bench.py -t 30 --only 'cornell_pt$' \
    -o results/r5_final2_pt.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm_front$' \
    -o results/r5_final2_front.csv
run python tools/run_bench.py -t 30 --only 'cornell_bpt$' \
    -o results/r5_final2_bpt.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm_r8$' \
    -o results/r5_final2_r8.csv
echo "=== chain61 done $(date) ===" >> $LOG
rm -f /tmp/chain61.pid
