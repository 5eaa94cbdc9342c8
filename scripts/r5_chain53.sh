#!/bin/bash
# Round-5 TPU chain #53 (waits for chain52): broadcast-dense traversal
# A/B (traverse._dense_bcast, IMBA_DENSE2_MAX) on the VCM quality rows.
# The 2188-tri cornell VCM family currently pays the vmem Pallas kernel
# ~22 ms/dispatch (sort machinery + fusion barrier); the (R, T) fused
# exhaustive MT is ~14 Gops of VPU work with no kernel, no sort.
# Compare ms_per_frame vs chain49's rows (same cap2+defer defaults).
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain53.log
echo $$ > /tmp/chain53.pid
echo "=== chain53 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain49.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain49 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env IMBA_CACHE_CAP_MULT=2 IMBA_DENSE2_MAX=4096 python tools/run_bench.py \
    -t 30 --only 'cornell_vcm_r16$' -o results/r5_q_r16_dense2.csv
run env IMBA_CACHE_CAP_MULT=2 IMBA_DENSE2_MAX=4096 python tools/run_bench.py \
    -t 30 --only 'cornell_water_vcm$' -o results/r5_q_water_dense2.csv

echo "=== chain53 done $(date) ===" >> $LOG
rm -f /tmp/chain53.pid
