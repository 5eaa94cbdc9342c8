#!/bin/bash
# Round-5 TPU chain #49 (waits for chain48): A/B the deferred vertex
# merging (IMBA_MERGE_DEFER, vcm._flush_merge_qlog — one batched merge
# dispatch per band/phase instead of one per bounce) on the tracked
# quality rows, all under the cap2 cache default chain46 validated.
#   1. cornell_vcm_r16 cap2, defer ON   (headline quality candidate)
#   2. cornell_vcm_r16 cap2, defer OFF  (same-session control; chain46's
#      defer-less row was 30.36 dB @ 2527 ms in an earlier session)
#   3. cornell_vcm parity cap2, defer ON (vs chain48's defer-OFF row)
#   4. bench.py smoke (headline + big + 1080p rewrite — PT is untouched
#      by defer; this is the round's first smoke baseline)
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r5_chain49.log
echo $$ > /tmp/chain49.pid
echo "=== chain49 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain48.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain48 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env IMBA_CACHE_CAP_MULT=2 python tools/run_bench.py -t 30 \
    --only 'cornell_vcm_r16$' -o results/r5_q_r16_cap2_defer.csv
run env IMBA_CACHE_CAP_MULT=2 IMBA_MERGE_DEFER=0 python tools/run_bench.py \
    -t 30 --only 'cornell_vcm_r16$' -o results/r5_q_r16_cap2_nodefer.csv
run env IMBA_CACHE_CAP_MULT=2 python tools/run_bench.py -t 30 \
    --only 'cornell_vcm$' -o results/r5_q_vcm_cap2_defer.csv
run python bench.py

echo "=== chain49 done $(date) ===" >> $LOG
rm -f /tmp/chain49.pid
