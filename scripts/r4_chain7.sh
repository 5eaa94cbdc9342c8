#!/bin/bash
# Round-4 TPU chain #7: final quality evidence.  Quiet 30 s rows with
# proxies + instancing selfcheck, then convergence gates at
# reference-scale budgets (the reference gates pt/bpt/vcm for 1 h each,
# test/run_bench.py:254-296; its own cornell goldens took 30 min-1 h to
# render).  Launch AFTER chain6's routing decisions are committed.
# Sequential, fresh process per entry, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r4_chain7.log
echo "=== chain7 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain6.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 0. Validate the light-pass emitter-termination fix: lt/bpt/pt must
#    now agree on cornell_indirect (was lt +17.3%, bpt +10.7%).
run python scripts/r4_bias5.py
# 1. Quiet 30 s rows: default cornell set + BASELINE config proxies +
#    instanced-vs-flattened selfcheck.  (vcm rows now bench at the
#    reference bench radius 2.0, not the golden-gen 0.003.)
run python tools/run_bench.py -t 30 --proxies --selfcheck-instances \
    -o results/bench_r4.csv
# 2. Convergence gates, reference budgets (threshold 0.0118 ~ 38.6 dB,
#    the r3 PT pass level).  pt converges in ~75 s; bpt_org can now
#    genuinely converge (consistent transport vs a PT-rendered golden);
#    bpt-on-indirect ceilings ~32 dB against the reference golden's
#    extra lamp-rebounce transport — budget it accordingly.
run python tools/run_bench.py --converge 0.0118 \
    --gate-budgets pt=300,bpt=2400,vcm=2400 --only cornell_pt \
    --curve-dir results/curves_r4 -o results/bench_r4_gate.csv
run python tools/run_bench.py --converge 0.0118 \
    --gate-budgets pt=300,bpt=2400,vcm=2400 --only cornell_bpt_org \
    --curve-dir results/curves_r4 -o results/bench_r4_gate_bpt_org.csv
run python tools/run_bench.py --converge 0.0118 \
    --gate-budgets pt=300,bpt=900,vcm=2400 --only cornell_bpt \
    --curve-dir results/curves_r4 -o results/bench_r4_gate_bpt.csv
run python tools/run_bench.py --converge 0.0118 \
    --gate-budgets pt=300,bpt=2400,vcm=2400 --only cornell_vcm \
    --curve-dir results/curves_r4 -o results/bench_r4_gate_vcm.csv
# 3. Headline refresh in a quiet fresh process (take=mxu default now).
run python bench.py

echo "=== chain7 done $(date) ===" >> $LOG
