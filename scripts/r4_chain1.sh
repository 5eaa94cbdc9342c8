#!/bin/bash
# Round-4 TPU measurement chain #1 (sequential, one fresh process per
# script so a device fault can't poison later entries; NO external
# timeouts — killing a TPU client mid-claim wedges the pool, CLAUDE.md).
# Fault-prone biggest-scene entries run LAST.
cd /root/repo
mkdir -p results
echo "=== chain1 start $(date) ===" >> results/r4_chain1.log
# Order = VERDICT priority: the two decisive experiments (PT cost split,
# VCM lpc knob) first so a truncated chain still answers items 1-2.
for s in profile_pt_split profile_vcm_lpc probe_while_cost r4_pairs_ab \
         bench_masked r4_regen_recheck probe_dense_pallas r4_fault_order; do
  echo "--- $s $(date) ---" >> results/r4_chain1.log
  python scripts/$s.py >> results/r4_chain1.log 2>&1
  echo "--- $s exit=$? $(date) ---" >> results/r4_chain1.log
done
# Same-hour A/B for the pairs selection (±10% session variance rule):
# the loop above ran SEL=front (default); rerun with the round-3 mode.
echo "--- r4_pairs_ab SEL=first $(date) ---" >> results/r4_chain1.log
IMBA_PAIRS_SEL=first python scripts/r4_pairs_ab.py >> results/r4_chain1.log 2>&1
echo "--- r4_pairs_ab SEL=first exit=$? $(date) ---" >> results/r4_chain1.log
echo "=== chain1 done $(date) ===" >> results/r4_chain1.log
