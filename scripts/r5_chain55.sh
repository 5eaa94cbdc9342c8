#!/bin/bash
# Round-5 TPU chain #55 (waits for chain54): the BASELINE north-star
# shape + radius re-tune.
#   1. still_life_pt_1080p time-to-PSNR curve against the chain50
#      self-golden (BASELINE.md north star: "time-to-PSNR-40, Still
#      Life 1080p PT"; the proxy scene stands in for the absent OBJ).
#   2. cornell_vcm_r12 30 s row (radius knee re-check at the new,
#      faster frame rate).
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain55.log
echo $$ > /tmp/chain55.pid
echo "=== chain55 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain57.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain57 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/run_bench.py -t 300 --only 'still_life_pt_1080p$' \
    --proxies --curve-dir results/curves_r5 -o results/r5_northstar.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm_r12$' \
    -o results/r5_final_r12.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm_r16$' \
    --sweep 'radius_factor=24' -o results/r5_final_r24.csv

echo "=== chain55 done $(date) ===" >> $LOG
rm -f /tmp/chain55.pid
