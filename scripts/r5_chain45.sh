#!/bin/bash
# Round-5 TPU chain #45 (waits for chain44): the radius-knee quality
# row under all three frame-speed levers, then the biggest merge
# workload refresh.
#   1. cornell_vcm_r16 30 s row — best measured 30 s config (29.47 dB
#      pre-levers); the 30 dB candidate if the levers buy ~15% frames.
#   2. still_life ppm_1M refresh under the union walk (last 27.0 s).
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain45.log
echo "=== chain45 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain44.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain44 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/run_bench.py -t 30 --only 'cornell_vcm_r16$' \
    -o results/r5_q_allnew_vcmr16.csv
run python tools/run_bench.py -t 30 --only 'still_life_ppm_1M$' \
    -o results/r5_slppm1m_union.csv

echo "=== chain45 done $(date) ===" >> $LOG
