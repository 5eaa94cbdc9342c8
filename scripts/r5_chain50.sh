#!/bin/bash
# Round-5 TPU chain #50 (waits for chain49): render the self-goldens for
# the procedural proxy rows (VERDICT r4 "What's missing" #1) — long PT
# self-renders, the reference's own render_refs.sh method.  One python
# process renders all five (shared init; each config compiles once).
# goldens/ is TRACKED in git (not results/) — commit after this chain.
# Sequential, NO external timeouts (never kill a TPU client mid-claim).
cd /root/repo
mkdir -p results goldens
LOG=results/r5_chain50.log
echo $$ > /tmp/chain50.pid
echo "=== chain50 queued $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain53.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain53 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run python tools/render_golden.py still_life_512_len4 still_life_512_len10 -t 450
run python tools/render_golden.py still_life_1080p_len8 -t 900
run python tools/render_golden.py still_life_1080p_len10 -t 900
run python tools/render_golden.py instances_1080p_len10 -t 900

echo "=== chain50 done $(date) ===" >> $LOG
rm -f /tmp/chain50.pid
