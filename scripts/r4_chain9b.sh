#!/bin/bash
# Round-4 TPU chain #9b: the 256^2 bisect came back ALL-PASS (full
# variant included, r4_slbisect.txt) while still_life_bpt_512 crashes
# the remote compile helper -> the crash needs BOTH the feature set and
# the 512^2+ scale (lpc 131072 / 262k-ray camera bands).  Re-bisect at
# 512^2.  Waits for chain9; chain10 is repointed to wait on this.
cd /root/repo
mkdir -p results
LOG=results/r4_chain9b.log
echo "=== chain9b start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain9_real.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r4_slbisect.py --variant full --size 512
run python scripts/r4_slbisect.py --variant bare --size 512
run python scripts/r4_slbisect.py --variant noenv --size 512
run python scripts/r4_slbisect.py --variant nocards --size 512
run python scripts/r4_slbisect.py --variant diffuse --size 512

echo "=== chain9b done $(date) ===" >> $LOG
