#!/bin/bash
# Round-4 TPU chain #8: (a) diagnose the two 1080p remote-compile
# failures from bench_r4.csv (still_life bpt/ppm, HTTP 500 within ~30 s
# of compile start) via scale + photon-count bisects, and (b) refresh
# the VCM-family 30 s rows under the new capped default light-path
# count (renderer.py::resolved_light_path_count — measured 13.2->5.1
# s/frame at equal 30 s PSNR, results/r4_lpc_quality.csv), then re-run
# the bpt_org/vcm convergence gates that the cap should unblock.
# Sequential, fresh process per entry, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r4_chain8.log
echo "=== chain8 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 1. Compile-failure diagnostics (fast-fail first: each failure costs
#    ~30 s; a success costs one tunnel compile + 30 s render).
run python tools/run_bench.py -t 30 --only still_life_bpt_512 \
    -o results/r4_diag_slbpt512.csv
run python tools/run_bench.py -t 30 --only still_life_bpt_1080p \
    -o results/r4_diag_slbpt1080.csv
run python tools/run_bench.py -t 30 --only still_life_ppm_131k \
    -o results/r4_diag_slppm131k.csv
run python tools/run_bench.py -t 30 --only still_life_ppm_1M \
    -o results/r4_diag_slppm1m.csv

# 2. VCM-family 30 s rows at the capped default lpc (was 524288 at
#    1024^2; now 131072).
run python tools/run_bench.py -t 30 --only cornell_vcm \
    -o results/bench_r4_lpccap_vcm.csv
run python tools/run_bench.py -t 30 --only cornell_water_vcm \
    -o results/bench_r4_lpccap_water.csv
run python tools/run_bench.py -t 30 --only cornell_bpt \
    -o results/bench_r4_lpccap_bpt.csv

# 3. Convergence gates that the faster frames may now unblock
#    (bpt_org was RMSE 0.0152 vs target 0.0118 at 2400 s with 3.8
#    s/frame; vcm was 0.0165 at 11.3 s/frame).
run python tools/run_bench.py --converge 0.0118 \
    --gate-budgets bpt=2400 --only cornell_bpt_org \
    --curve-dir results/curves_r4 -o results/bench_r4_gate_bpt_org2.csv
run python tools/run_bench.py --converge 0.0118 \
    --gate-budgets vcm=2400 --only cornell_vcm \
    --curve-dir results/curves_r4 -o results/bench_r4_gate_vcm2.csv

echo "=== chain8 done $(date) ===" >> $LOG
