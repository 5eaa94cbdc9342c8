#!/bin/bash
# Round-4 TPU measurement chain #6: record-fetch (IMBA_TAKE) A/Bs, the
# fused-frame re-attribution, the vmem fused-vs-banded check, and the
# lpc quality/speed tradeoff.  Waits for chain5's claim to free, then
# runs sequentially — one fresh process per entry, NO external timeouts
# (CLAUDE.md: killing a TPU client mid-claim wedges the pool).
cd /root/repo
mkdir -p results
LOG=results/r4_chain6.log
echo "=== chain6 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain5.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 0. Quality first: is the shared VCM-template machinery unbiased?
run python scripts/r4_bias2.py
# 0b. The r3 "29 dB BPT ceiling" was measured on cornell_INDIRECT, but
# the bisect (no ml10 bias) ran cornell_org.  Does trusted PT also
# plateau vs the indirect golden (scene/golden mismatch), and does
# BPT-vs-PT deviate on that scene at all?
run python scripts/golden_check.py \
    /root/reference/test/scenes/cornell/cornell_indirect.scene \
    /root/reference/test/references/ref_cornell_indirect.png 240 pt
run env IMBA_BIAS_SCENE=/root/reference/test/scenes/cornell/cornell_indirect.scene \
    IMBA_BIAS_BPT=1 python scripts/r4_bias2.py
# 1. Fused-frame cost re-attribution + record-fetch tier A/B (36 tris).
run env IMBA_TAKE=gather python scripts/r4_pt_split2.py
run env IMBA_TAKE=select python scripts/r4_pt_split2.py
run env IMBA_TAKE=mxu    python scripts/r4_pt_split2.py
# 2. MXU record fetch on the 2188-tri VCM scene (vs chain5 slice=0 rows).
run env IMBA_TAKE=mxu IMBA_TAKE_MXU_MAX=4096 python scripts/r4_slice_ab.py
# 3. vmem mode: does frame fusing regress with Pallas inside the graph?
run env IMBA_PT_FUSE=1 python scripts/r4_fused_vmem_ab.py
run env IMBA_PT_FUSE=0 python scripts/r4_fused_vmem_ab.py
# 4. lpc speed/quality: 30 s quality rows at the two light-path counts.
run python tools/run_bench.py -t 30 --only cornell_vcm \
    --sweep light_path_count=524288,131072 -o results/r4_lpc_quality.csv

echo "=== chain6 done $(date) ===" >> $LOG
