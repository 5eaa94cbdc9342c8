#!/bin/bash
# Round-4 chain #13: end-of-round validation (CPU only, runs after all
# TPU timing so it can't poison measurements).
#   1. Full pytest (must be green: includes the shard_map delta-light
#      fix and the fused-frame tolerance from this session).
#   2. Multichip dryrun (driver contract).
# WAITS for chain12.
cd /root/repo
mkdir -p results
LOG=results/r4_chain13.log
echo "=== chain13 start $(date) ===" >> $LOG

while kill -0 "$(cat /tmp/chain12.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
echo "=== chain12 done, starting $(date) ===" >> $LOG

run() {
  echo "--- $* $(date) ---" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- exit=$? $(date) ---" >> $LOG
}

run env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python __graft_entry__.py
run python -m pytest tests/ -q

echo "=== chain13 done $(date) ===" >> $LOG
