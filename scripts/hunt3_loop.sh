#!/bin/bash
# Fresh-connection fast-window sampler: the tunnel's throughput is
# per-CONNECTION (two simultaneous processes measured 653 vs 325 GB/s on
# the same chip), so each attempt spawns a NEW process; one that lands a
# fast connection runs the interleaved battery in-process before the luck
# changes. Exit 0 = captured.
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
