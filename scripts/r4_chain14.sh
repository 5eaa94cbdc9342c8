#!/bin/bash
# Round-4 TPU chain #14: post-chain12 decisions, measured.
#   1. take-mode crossover at 2188 rows (specular cornell BPT/VCM frame,
#      CURRENT tree): chain12's mxu8 rows (bpt 2212 / vcm 4237 ms) need
#      same-tree gather + mxu controls — the old r4_slice_ab rows predate
#      the lpc cap and kind specialization, so they are not comparable.
#   2. khit K A/B on the masked canopy: K=4 default vs K=2
#      (IMBA_KHIT_K, ops/pallas_khit.py) — most masked traces resolve in
#      one round, and the kernel's early-exit bound tightens as K drops.
#   3. The spec quality rows chain11 missed (its --only alternation
#      matched nothing: trailing '$' means EXACT full-string match).
#   4. Final headline record for the round.
# WAITS for chain13. Sequential, NO external timeouts (never kill a TPU
# client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain14.log
echo "=== chain14 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain13.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain13 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 1. 2188-row crossover controls (mxu8 rows already in r4_slice_ab.txt).
run python scripts/r4_slice_ab.py
run env IMBA_TAKE=mxu python scripts/r4_slice_ab.py

# 2. khit K A/B (canopy, writes bench_masked.csv; stdout keeps both).
run python scripts/bench_masked.py
run env IMBA_KHIT_K=2 python scripts/bench_masked.py

# 3. Spec quality rows (PSNR parity vs bench_r4.csv / chain8).
run python tools/run_bench.py -t 30 --only 'cornell_pt$' \
    -o results/r4_spec_q_pt.csv
run python tools/run_bench.py -t 30 --only 'cornell_bpt_org$' \
    -o results/r4_spec_q_bpt.csv
run python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    -o results/r4_spec_q_vcm.csv

# 4. Final headline record.
run python bench.py

echo "=== chain14 done $(date) ===" >> $LOG
