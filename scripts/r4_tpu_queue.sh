#!/bin/bash
# Round-4 TPU job queue: retry the verify render until the tunneled pool
# comes back (UNAVAILABLE = pool down/wedged, not code), then run the
# measurement chain.  NO external timeouts anywhere (CLAUDE.md: killing a
# TPU client mid-claim wedges the pool); each failed attempt exits on its
# own after the backend-init error.
cd /root/repo
LOG=/tmp/r4_queue.log
echo "=== queue start $(date) ===" >> $LOG
for i in $(seq 1 24); do
  echo "--- verify render attempt $i $(date) ---" >> $LOG
  python -m imbatracer_tpu \
    /root/reference/test/scenes/cornell/cornell_org.scene \
    /tmp/verify_r4.png -a pt -w 256 -h2 256 -t 20 -q \
    >> $LOG 2>&1
  rc=$?
  echo "--- attempt $i exit=$rc $(date) ---" >> $LOG
  if [ $rc -eq 0 ] && [ -f /tmp/verify_r4.png ]; then
    echo "=== verify render OK; starting chain1 $(date) ===" >> $LOG
    bash scripts/r4_chain1.sh
    echo "=== chain1 finished $(date) ===" >> $LOG
    exit 0
  fi
  sleep 120
done
echo "=== queue gave up after 24 attempts $(date) ===" >> $LOG
exit 1
