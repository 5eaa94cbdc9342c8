#!/bin/bash
# Round-4 TPU chain #12: byte-plane one-hot fetch (take=mxu8) A/B.
#   mxu8 replaces the two HIGHEST f32 dots of take=mxu with ONE
#   default-precision bf16 dot over 4x width (8-bit planes are exact in
#   bf16), and stages the (R,T) one-hot once in bf16 instead of twice in
#   f32.  Bit-exact (tests/test_take.py).  Questions:
#   1. Does mxu8 beat mxu end-to-end on the headline frame (dense
#      cornell 1024^2, fused)?  Adjacent-in-time runs control the pool's
#      +-10% session variance.  no_interaction ablation bounds the
#      remaining fetch cost in each mode.
#   2. Does the cheaper formulation move the crossover vs gather at
#      2188 rows (specular cornell VCM/BPT, where mxu lost 2.5%)?
# WAITS for chain11. Sequential, NO external timeouts (never kill a TPU
# client mid-claim).
cd /root/repo
mkdir -p results
LOG=results/r4_chain12.log
echo "=== chain12 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain11.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain11 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 1. Headline fused-frame A/B (full + no_interaction per mode).
run env IMBA_TAKE=mxu  python scripts/r4_pt_split2.py
run env IMBA_TAKE=mxu8 python scripts/r4_pt_split2.py

# 2. 2188-row crossover: specular cornell BPT/VCM frames, forced mxu8
#    (gather baseline + mxu rows already in r4_slice_ab.txt).
run env IMBA_TAKE=mxu8 python scripts/r4_slice_ab.py

echo "=== chain12 done $(date) ===" >> $LOG
