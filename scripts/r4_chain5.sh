#!/bin/bash
# Round-4 TPU measurement chain #5 (consolidated priority order after the
# lpc result; replaces the chain3/chain4 waiters).  Sequential, one fresh
# process per entry, NO external timeouts (CLAUDE.md: killing a TPU
# client mid-claim wedges the pool).
cd /root/repo
mkdir -p results
LOG=results/r4_chain5.log
echo "=== chain5 start $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 1. Connect-slice locality A/B (VERDICT item 1 fix).
run env IMBA_VCM_CONNECT_SLICE=0     python scripts/r4_slice_ab.py
run env IMBA_VCM_CONNECT_SLICE=32768 python scripts/r4_slice_ab.py
run env IMBA_VCM_CONNECT_SLICE=4096  python scripts/r4_slice_ab.py
# 2. Masked canopy with the K-hit kernel (VERDICT item 4 cost target).
run python scripts/bench_masked.py
# 3. Skip-link scattered traversal experiment (item 3 alternative).
run python scripts/r4_skiplink_scatter.py
# 4. Dense-vs-vmem fused frame (item 8 / headline bottom end).
run python scripts/r4_vmem_dense_ab.py
# 5. BPT bias bisect (quality gates root cause).
run python scripts/r4_bpt_bias.py
echo "=== chain5 done $(date) ===" >> $LOG
