#!/bin/bash
# Round-4 TPU chain #10: post-bisect cleanups.
#   1. Deeper lpc sweep at 1024^2 (is 2^16 another free halving of the
#      VCM/BPT frame at equal 30 s quality, or does light-technique
#      variance start to bite below 2^17?)
#   2. Fresh-process headline re-record (bench.py) for BENCH_r04.
#   3. CPU validation AFTER all TPU timing: multichip dryrun + full
#      pytest (CPU-heavy work poisons concurrent TPU timings).
# WAITS for chain9. Sequential, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r4_chain10.log
echo "=== chain10 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain9.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain9 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 0. VCM gate at the reference-faithful 1 h budget (the reference gates
#    each algorithm for 1 h, test/run_bench.py:254-296; chain8's 2400 s
#    run reached RMSE 0.01415 vs the 0.0118 target with the curve still
#    creeping — projected PASS near ~3400-3600 s at 6.7 s/frame).
run python tools/run_bench.py --converge 0.0118 \
    --gate-budgets vcm=3600 --only 'cornell_vcm$' \
    --curve-dir results/curves_r4 -o results/bench_r4_gate_vcm3600.csv

# 1. lpc sweep below the cap (cornell_vcm also runs vcm_front via the
#    substring match; bpt row covers the connect-heavy estimator).
run python tools/run_bench.py -t 30 --only 'cornell_vcm$' \
    --sweep light_path_count=65536,32768 -o results/r4_lpc_sweep_vcm.csv
run python tools/run_bench.py -t 30 --only 'cornell_bpt_org$' \
    --sweep light_path_count=131072,65536 -o results/r4_lpc_sweep_bpt.csv

# 2. Headline, quiet fresh process.
run python bench.py

# 3. CPU validation (TPU timing all done).
run env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python __graft_entry__.py
run python -m pytest tests/ -q

echo "=== chain10 done $(date) ===" >> $LOG
