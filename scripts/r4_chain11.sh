#!/bin/bash
# Round-4 TPU chain #11: per-scene kind specialization (commit 968e1ae+)
# measured end-to-end.
#   1. Headline A/B: bench.py specialized (default) vs IMBA_SPEC=0 in
#      adjacent fresh processes (the cornell-org megastep is diffuse-only
#      + tri-light-only under specialization -> the Blinn/Phong/glass
#      transcendental chains disappear from the bounce program).
#   2. Estimator sanity on TPU: 30 s quality rows must match the chain7/8
#      numbers (specialization is exact; any PSNR shift is a bug).
#   3. VCM 1 h convergence gate retry: chain10's run reached RMSE 0.0126
#      vs the 0.0118 target at 522 samples; if specialization buys
#      >~20% frame time the sample count at 3600 s may close the gap.
# WAITS for chain9d. Sequential, NO external timeouts (never kill a TPU
# client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain11.log
echo "=== chain11 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain9d.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain9d done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 1. Headline A/B (fresh process each; adjacent in time so the pool's
#    session variance doesn't confound).
run python bench.py
run env IMBA_SPEC=0 python bench.py
run python bench.py

# 2. Quality rows (PSNR parity check vs bench_r4.csv).
run python tools/run_bench.py -t 30 \
    --only 'cornell_pt$|cornell_bpt_org$|cornell_vcm$' \
    -o results/r4_spec_quality.csv

# 3. VCM gate retry at the reference 1 h budget.
run python tools/run_bench.py --converge 0.0118 --gate-budgets vcm=3600 \
    --only 'cornell_vcm$' --curve-dir results/curves_r4 \
    -o results/bench_r4_gate_vcm_spec.csv

echo "=== chain11 done $(date) ===" >> $LOG
