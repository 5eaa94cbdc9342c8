#!/bin/bash
# chain36: full pytest re-run (flake check for the 21:45 SIGABRT), then
# the merge slope probe. Sequenced after chain35 so the machine is quiet
# for each.
LOG=/root/repo/results/r4_chain36.log
echo "=== chain36 queued $(date -u)" >> $LOG
while kill -0 $(cat /tmp/chain35.pid) 2>/dev/null; do sleep 20; done
echo "=== chain36 start $(date -u)" >> $LOG
cd /root/repo
echo "--- pytest full re-run $(date -u)" >> $LOG
python -m pytest tests/ -q >> $LOG 2>&1
echo "--- pytest exit=$? $(date -u)" >> $LOG
echo "--- python scripts/r5_merge_slope.py $(date -u)" >> $LOG
python scripts/r5_merge_slope.py >> $LOG 2>&1
echo "--- exit=$? $(date -u)" >> $LOG
echo "=== chain36 done $(date -u)" >> $LOG
