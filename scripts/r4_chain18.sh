#!/bin/bash
# Round-4 TPU chain #18: decompose the fused-frame bounce-chain share.
# The post-spec split (r4_pt_split2.txt) leaves ~32 ms attributed to the
# "bounce" block + loop floor at 48.6 ms/frame; this splits it into RNG
# chains / Russian roulette / BSDF sampling via the new lane-varying
# ablation stand-ins (IMBA_SPLIT_FLOOR=1).
# WAITS for chain17.  Sequential, NO external timeouts (never kill a
# TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain18.log
echo "=== chain18 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain17.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain17 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env IMBA_SPLIT_FLOOR=1 python scripts/r4_pt_split2.py

echo "=== chain18 done $(date) ===" >> $LOG
