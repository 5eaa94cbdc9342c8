#!/bin/bash
# Round-5 TPU chain #47 (waits for chain46): the last cheap 30 dB
# knob — light-path count ABOVE the 2^17 VCM cap on the r16 row.
# The sub-cap sweep showed merging VCM collapses BELOW 2^17
# (r4_lpc_quality.csv); the up direction was never measured: 2x paths
# = 2x photons/frame (quality up) at roughly +1 light pass + larger
# merge (frame cost up).  30 s budget decides.
cd /root/repo
mkdir -p results
LOG=results/r5_chain47.log
echo "=== chain47 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain46.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain46 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env IMBA_VCM_LPC_CAP=262144 python tools/run_bench.py -t 30 \
    --only 'cornell_vcm_r16$' -o results/r5_q_r16_lpc256k.csv

echo "=== chain47 done $(date) ===" >> $LOG
