#!/bin/bash
# chain33: PT (photon-tile size) sweep for the merge kernel on TPU.
# Waits for the full pytest run to finish first (CPU load poisons TPU
# timings).  No external timeout on the TPU job (wedge rule).
LOG=/root/repo/results/r4_chain33.log
echo "=== chain33 queued $(date -u)" >> $LOG
while kill -0 $(cat /tmp/pytest.pid) 2>/dev/null; do sleep 20; done
echo "=== chain33 start $(date -u)" >> $LOG
cd /root/repo
echo "--- python scripts/r5_merge_pt.py $(date -u)" >> $LOG
python scripts/r5_merge_pt.py >> $LOG 2>&1
echo "--- exit=$? $(date -u)" >> $LOG
echo "=== chain33 done $(date -u)" >> $LOG
