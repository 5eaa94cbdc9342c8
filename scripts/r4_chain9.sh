#!/bin/bash
# Round-4 TPU chain #9: still_life compile-failure feature bisect.
# WAITS for chain8 to exit (one TPU client at a time), then:
#   0. CPU control: the full variant must PASS on CPU (is the crash
#      TPU-compiler-specific?)
#   1. TPU feature bisect at 256^2 bpt, fresh process per variant.
# Sequential, NO external timeouts.
cd /root/repo
mkdir -p results
LOG=results/r4_chain9.log
echo "=== chain9 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain8.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain8 done, starting bisect $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

# 0. CPU control (64^2: CPU stream-mode frames are slow).
run env JAX_PLATFORM_NAME=cpu python scripts/r4_slbisect.py \
    --variant full --size 64
# 1. TPU bisect, fail-fast order: full confirms the repro, bare is the
#    expected-PASS control, then one feature at a time.
run python scripts/r4_slbisect.py --variant full
run python scripts/r4_slbisect.py --variant bare
run python scripts/r4_slbisect.py --variant noenv
run python scripts/r4_slbisect.py --variant nocards
run python scripts/r4_slbisect.py --variant diffuse

echo "=== chain9 done $(date) ===" >> $LOG
