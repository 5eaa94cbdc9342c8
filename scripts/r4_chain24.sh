#!/bin/bash
# Round-4 TPU chain #24 (replaces chain23, whose waiter was killed
# pre-claim): validate + measure the khit sort-hoist, settle the
# prepass default, then refresh the still_life proxy rows.
#
# Chain21's knob matrix (results/r4_maskframe.txt) showed the khit
# re-trace loop's per-round FIXED machinery dominates the masked
# excess (prepass-only floor 1666 ms vs ~3522 default; khit-without-
# prepass 2825 — shrinking the active set doesn't pay, so the
# prepass's extra full dispatch is a net loss).  The hoist computes
# the Morton permutation ONCE before the while_loop
# (pallas_khit.khit_presorted) instead of re-sorting every round.
#
# Sequencing rule: CPU-heavy steps (pytest) run INSIDE this chain so
# they never overlap a TPU timing window (1-CPU machine).
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain24.log
echo "=== chain24 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain22.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done
echo "=== chain24 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 1. CPU validation of the hoist (TPU idle here).
if python -m pytest tests/test_khit.py tests/test_masks.py -q \
     >> $LOG 2>&1; then
  echo "=== hoist tests GREEN $(date) ===" >> $LOG
else
  echo "=== hoist tests FAILED - reverting hoist $(date) ===" >> $LOG
  git checkout -- imbatracer_tpu/render/traverse.py \
      imbatracer_tpu/ops/pallas_khit.py
fi

# 2. Masked canopy A/B: default (prepass ON) vs prepass OFF, both on
#    whatever tree state step 1 left (hoisted if green).
run python scripts/bench_masked.py
mv results/bench_masked.csv results/bench_masked_prepass1.csv 2>/dev/null
run env IMBA_MASK_PREPASS=0 python scripts/bench_masked.py
mv results/bench_masked.csv results/bench_masked_prepass0.csv 2>/dev/null

# 3. still_life proxy refresh (narrow mask record + hoist).
run python tools/run_bench.py -t 30 --only 'still_life_bpt_512$' \
    -o results/r4_final_slbpt512.csv
run python tools/run_bench.py -t 30 --only 'still_life_ppm_1M$' \
    -o results/r4_final_slppm1m.csv

echo "=== chain24 done $(date) ===" >> $LOG
