#!/bin/bash
# Fast-window kernel decomposition hunt (VERDICT r3 item 1).
#
# Loops the raw-read probe until the tunnel lands in a fast window
# (read >= $THRESH GB/s), then immediately runs the decomposition
# back-to-back in that window: read A, pc, fh23, fh21, read B (ABBA
# bracketing). Appends everything to $LOG with timestamps. One variant
# per process (tunnel stalls only cost that attempt; compile cache makes
# retries cheap).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/fastwindow.log}
THRESH=${THRESH:-500}
MAX_ROUNDS=${MAX_ROUNDS:-40}
SLEEP=${SLEEP:-45}

run() { # run <variant> -> prints "NNN" (GB/s) or "fail"
    out=$(timeout 420 python scripts/kernel_probe.py "$1" 2>/dev/null | tail -1)
    echo "$(date +%H:%M:%S) $out" >> "$LOG"
    echo "$out" | grep -oP '(?<=: )\d+(?= GB/s)' || echo fail
}

echo "=== hunt start $(date) thresh=$THRESH ===" >> "$LOG"
for i in $(seq 1 "$MAX_ROUNDS"); do
    if ! timeout 100 python bench.py --probe 2>/dev/null | grep -q "probe: ok"; then
        echo "$(date +%H:%M:%S) probe failed (round $i)" >> "$LOG"
        sleep "$SLEEP"; continue
    fi
    r=$(run read)
    if [ "$r" = fail ]; then sleep "$SLEEP"; continue; fi
    if [ "$r" -ge "$THRESH" ]; then
        echo "$(date +%H:%M:%S) FAST WINDOW ($r GB/s) - decomposing" >> "$LOG"
        pc=$(run pc)
        f3=$(run fh23)
        f1=$(run fh21)
        r2=$(run read)
        echo "$(date +%H:%M:%S) ABBA: read=$r pc=$pc fh23=$f3 fh21=$f1 read2=$r2" >> "$LOG"
        if [ "$r2" != fail ] && [ "$r2" -ge "$THRESH" ]; then
            echo "$(date +%H:%M:%S) WINDOW HELD - decomposition valid" >> "$LOG"
            exit 0
        fi
        echo "$(date +%H:%M:%S) window collapsed mid-run; continuing" >> "$LOG"
    fi
    sleep "$SLEEP"
done
echo "=== hunt exhausted $(date) ===" >> "$LOG"
exit 1
