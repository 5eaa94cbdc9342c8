#!/bin/bash
# chain39: still_life ppm_1M refresh under the merge flip (PPM is the
# other merge consumer; its row predates BLKQ=128/PT=256).
LOG=/root/repo/results/r4_chain39.log
echo "=== chain39 queued $(date -u)" >> $LOG
while kill -0 $(cat /tmp/chain38.pid) 2>/dev/null; do sleep 20; done
echo "=== chain39 start $(date -u)" >> $LOG
cd /root/repo
echo "--- still_life_ppm_1M refresh $(date -u)" >> $LOG
python tools/run_bench.py -t 30 --only 'still_life_ppm_1M$' \
    -o results/r5_slppm1m_mergeflip.csv >> $LOG 2>&1
echo "--- exit=$? $(date -u)" >> $LOG
echo "=== chain39 done $(date -u)" >> $LOG
