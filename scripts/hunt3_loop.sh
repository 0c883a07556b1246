#!/bin/bash
# HISTORICAL (round 4): the "653 vs 325 GB/s simultaneous connections"
# that motivated this sampler were K=16 vs K=8 probes against the same
# ~26 ms RTT floor — a timing artifact, not connection luck (BASELINE.md
# post-mortem). Kept as methodology history. Exit 0 = battery captured.
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/hunt3.log}
N=${N:-200}
echo "=== hunt3 loop start $(date) ===" >> "$LOG"
for i in $(seq 1 "$N"); do
    PANACUS_HUNT_THRESH=${THRESH:-500} PANACUS_HUNT_DEADLINE_S=50 \
    PANACUS_HUNT_POLL_S=18 PANACUS_HUNT_ROUNDS=8 \
        timeout 900 python scripts/fastwindow_hunt2.py >> "$LOG" 2>/dev/null
    rc=$?
    echo "--- attempt $i rc=$rc $(date +%H:%M:%S) ---" >> "$LOG"
    if [ "$rc" = 0 ]; then
        echo "=== FAST WINDOW CAPTURED ===" >> "$LOG"
        exit 0
    fi
    sleep "${GAP:-5}"
done
echo "=== hunt3 exhausted $(date) ===" >> "$LOG"
exit 1
