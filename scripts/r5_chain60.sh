#!/bin/bash
# Round-5 TPU chain #60 (waits for chain59): the len10 1080p golden,
# third attempt (chain50's was CPU-contended, chain56's hit the hybrid
# VMEM crash — hybrid now defaults off).  HOST QUIET.
cd /root/repo
mkdir -p results goldens
LOG=results/r5_chain60.log
echo $$ > /tmp/chain60.pid
echo "=== chain60 queued $(date) ===" >> $LOG
while kill -0 "$(cat /tmp/chain59.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain59 done, starting $(date) ===" >> $LOG
run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}
run python tools/render_golden.py still_life_1080p_len10 -t 600
echo "=== chain60 done $(date) ===" >> $LOG
rm -f /tmp/chain60.pid
