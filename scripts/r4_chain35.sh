#!/bin/bash
# chain35: downward BLKQ sweep for the merge kernel, after chain34.
LOG=/root/repo/results/r4_chain35.log
echo "=== chain35 queued $(date -u)" >> $LOG
while kill -0 $(cat /tmp/chain34.pid) 2>/dev/null; do sleep 20; done
echo "=== chain35 start $(date -u)" >> $LOG
cd /root/repo
echo "--- python scripts/r5_merge_blkq.py $(date -u)" >> $LOG
python scripts/r5_merge_blkq.py >> $LOG 2>&1
echo "--- exit=$? $(date -u)" >> $LOG
echo "=== chain35 done $(date -u)" >> $LOG
