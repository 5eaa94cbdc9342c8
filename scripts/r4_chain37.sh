#!/bin/bash
# chain37: post-flip validation — full pytest under the new merge
# defaults (BLKQ=128/PT=256), then the 30s VCM quality row refresh
# (merge is ~18-36 dispatches/frame; the flip should cut ~0.2-0.4 s of
# the 3.31 s frame). Waits for chain36 (pytest@old-defaults + slope).
LOG=/root/repo/results/r4_chain37.log
echo "=== chain37 queued $(date -u)" >> $LOG
while kill -0 $(cat /tmp/chain36.pid) 2>/dev/null; do sleep 20; done
echo "=== chain37 start $(date -u)" >> $LOG
cd /root/repo
echo "--- pytest full (new merge defaults) $(date -u)" >> $LOG
python -m pytest tests/ -q >> $LOG 2>&1
echo "--- pytest exit=$? $(date -u)" >> $LOG
echo "--- vcm 30s quality row (new merge defaults) $(date -u)" >> $LOG
python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    -o results/r5_spec_q_vcm_mergeflip.csv >> $LOG 2>&1
echo "--- exit=$? $(date -u)" >> $LOG
echo "=== chain37 done $(date -u)" >> $LOG
