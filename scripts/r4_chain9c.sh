#!/bin/bash
# Round-4 TPU chain #9c: locate the masked-scene compile crash's call
# site.  Bisect said: alpha-masked cards necessary, 512^2+ necessary,
# env/materials irrelevant (r4_slbisect.txt).  PT at 1080p runs the
# same masked traversal at 262k-lane camera bands fine, so suspicion
# falls on the light pass.  Three probes at 512^2 on the full scene:
#   lpc=32768 - shrink ONLY the light pass (camera unchanged)
#   algo=lt   - light pass + camera connection only (no camera pass)
#   algo=vcm_pt - template camera pass only (no light pass)
# Waits for chain10.
cd /root/repo
mkdir -p results
LOG=results/r4_chain9c.log
echo "=== chain9c start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain10.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python scripts/r4_slbisect.py --variant full --size 512 --lpc 32768
run python scripts/r4_slbisect.py --variant full --size 512 --algo lt
run python scripts/r4_slbisect.py --variant full --size 512 --algo vcm_pt
run python scripts/r4_slbisect.py --variant full --size 512 --algo ppm

echo "=== chain9c done $(date) ===" >> $LOG
