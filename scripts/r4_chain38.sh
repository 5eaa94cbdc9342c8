#!/bin/bash
# chain38: follow the radius_factor quality curve to its knee (cost is
# flat, quality rose 23.1 -> 25.6 -> 27.6 dB over 1/2/4 — where does
# bias turn it over?). Runs under the new merge defaults.
LOG=/root/repo/results/r4_chain38.log
echo "=== chain38 queued $(date -u)" >> $LOG
while kill -0 $(cat /tmp/chain37.pid) 2>/dev/null; do sleep 20; done
echo "=== chain38 start $(date -u)" >> $LOG
cd /root/repo
echo "--- radius_factor extended sweep $(date -u)" >> $LOG
python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    --sweep radius_factor=4.0,6.0,8.0,12.0,16.0 \
    -o results/r5_radius_sweep2.csv >> $LOG 2>&1
echo "--- exit=$? $(date -u)" >> $LOG
echo "=== chain38 done $(date -u)" >> $LOG
