#!/bin/bash
# Round-5 TPU chain #51 (waits for chain50): stream-frame attribution +
# the deferred-NEE-occlusion A/B (VERDICT r4 items 2 and 7).
#   1. 48k-tri frame ablation split (default + banded + knockouts)
#   2. IMBA_SHADOW_DEFER=1 banded frame (A/B vs run 1's banded_full row;
#      defer is inactive under compaction, so compaction is pinned off)
#   3. bench.py under IMBA_SHADOW_DEFER=1 (headline fused-frame A/B vs
#      chain49's default bench.py — the ~17 ms fusion-floor probe)
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain51.log
echo $$ > /tmp/chain51.pid
echo "=== chain51 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain50.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain50 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r5_big_split.py
run env IMBA_PT_COMPACT=0 IMBA_SHADOW_DEFER=2 IMBA_BIG_ABLATE=0 \
    python scripts/r5_big_split.py
run env IMBA_SHADOW_DEFER=1 python bench.py

echo "=== chain51 done $(date) ===" >> $LOG
rm -f /tmp/chain51.pid
