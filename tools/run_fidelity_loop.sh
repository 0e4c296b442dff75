#!/bin/bash
# Drive tools/fidelity_demo.py to completion across remote-TPU-worker
# crashes (VERDICT round-4 item 3): the tool checkpoints its reference
# light-map warmup every 4 volumes and its reference frame every band;
# this loop just restarts it until it prints the fidelity line.
# Usage: tools/run_fidelity_loop.sh [logfile]
LOG=${1:-/tmp/fidelity_run.log}
cd "$(dirname "$0")/.." || exit 1
for i in $(seq 1 40); do
  echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 3300 python tools/fidelity_demo.py >> "$LOG" 2>&1
  rc=$?
  if grep -q "^fidelity@" "$LOG"; then
    echo "=== DONE rc=$rc ===" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $i exited rc=$rc, retrying ===" >> "$LOG"
  sleep 5
done
exit 1
