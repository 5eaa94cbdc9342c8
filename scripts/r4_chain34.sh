#!/bin/bash
# chain34: merge-prep stage split on TPU, after chain33 (PT sweep) drains.
LOG=/root/repo/results/r4_chain34.log
echo "=== chain34 queued $(date -u)" >> $LOG
while kill -0 $(cat /tmp/chain33.pid) 2>/dev/null; do sleep 20; done
echo "=== chain34 start $(date -u)" >> $LOG
cd /root/repo
echo "--- python scripts/r5_prep_split.py $(date -u)" >> $LOG
python scripts/r5_prep_split.py >> $LOG 2>&1
echo "--- exit=$? $(date -u)" >> $LOG
echo "=== chain34 done $(date -u)" >> $LOG
