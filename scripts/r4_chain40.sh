#!/bin/bash
# chain40: record the tuned short-budget VCM rows (radius_factor 8.0)
# for cornell_specular (known from the sweep) and cornell_water (the
# weakest quality row, 18-21 dB through round 4 — caustics benefit most
# from merging, so the tuned radius may move it a lot).
LOG=/root/repo/results/r4_chain40.log
echo "=== chain40 queued $(date -u)" >> $LOG
while kill -0 $(cat /tmp/chain39.pid) 2>/dev/null; do sleep 20; done
echo "=== chain40 start $(date -u)" >> $LOG
cd /root/repo
echo "--- tuned VCM rows $(date -u)" >> $LOG
python tools/run_bench.py -t 30 --only 'cornell_vcm_r8$' \
    -o results/r5_vcm_r8.csv >> $LOG 2>&1
python tools/run_bench.py -t 30 --only 'cornell_water_vcm_r8$' \
    -o results/r5_water_r8.csv >> $LOG 2>&1
echo "--- exit=$? $(date -u)" >> $LOG
echo "=== chain40 done $(date -u)" >> $LOG
