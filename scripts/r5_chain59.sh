#!/bin/bash
# Round-5 TPU chain #59 (waits for chain56): validate the hybrid masked
# schedule end-to-end — expectation ~1.0x opaque (vs 1.48x while-only),
# bitwise-identical film (exact schedule change only).
cd /root/repo
mkdir -p results
LOG=results/r5_chain59.log
echo $$ > /tmp/chain59.pid
echo "=== chain59 queued $(date) ===" >> $LOG
while kill -0 "$(cat /tmp/chain56.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain56 done, starting $(date) ===" >> $LOG
run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}
run python scripts/bench_masked.py
run env IMBA_MASK_HYBRID=0 python scripts/bench_masked.py
echo "=== chain59 done $(date) ===" >> $LOG
rm -f /tmp/chain59.pid
