"""Single-process fast-window hunter (TPU hardware).

HISTORICAL (round 4): the "fast/slow window" this hunted turned out to
be a timing artifact — the pre-fix read probe reported K*bytes/RTT (the
hunter's K=8 polls read ~330, the roofline's K=16 read ~650, same chip,
same time). See BASELINE.md's post-mortem; kept as methodology history.

Compiles every probe variant once, then polls the raw-read bandwidth;
the moment a window >= THRESH GB/s appears it runs the full interleaved
battery IN THE SAME PROCESS (no recompile, same-second brackets) and
exits 0. Exits 3 if no fast window appears within the deadline.

    PANACUS_HUNT_THRESH=500 PANACUS_HUNT_DEADLINE_S=1500 \
        python scripts/fastwindow_hunt2.py

Drive under `timeout` from an outer restart loop: a tunnel stall only
costs one process.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

THRESH = float(os.environ.get("PANACUS_HUNT_THRESH", "500"))
DEADLINE = float(os.environ.get("PANACUS_HUNT_DEADLINE_S", "1500"))
POLL_S = float(os.environ.get("PANACUS_HUNT_POLL_S", "25"))
ROUNDS = int(os.environ.get("PANACUS_HUNT_ROUNDS", "8"))

from kernel_interleave import _load_probe_funcs  # noqa: E402
import numpy as np  # noqa: E402


def main():
    variants, M, K, read_fn = _load_probe_funcs()
    order = ["read", "pc", "pcx", "pcm", "fh21", "fhm1", "fh23", "fhm3",
             "cur1", "cur3"]
    sel = {v: variants[v] for v in order}
    for name, fn in sel.items():
        t0 = time.perf_counter()
        read_fn() if name == "read" else fn()
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    t_end = time.time() + DEADLINE
    while time.time() < t_end:
        bw = read_fn() / 1e9
        print(f"{time.strftime('%H:%M:%S')} read: {bw:.0f} GB/s", flush=True)
        if bw >= THRESH:
            print(f"FAST WINDOW ({bw:.0f} GB/s) — interleaved battery",
                  flush=True)
            results = {v: [] for v in sel}
            for r in range(ROUNDS):
                line = []
                for name, fn in sel.items():
                    if name == "read":
                        b = read_fn()
                    else:
                        t0 = time.perf_counter()
                        fn()
                        b = M.nbytes * K / (time.perf_counter() - t0)
                    results[name].append(b / 1e9)
                    line.append(f"{name}={b / 1e9:.0f}")
                print(f"round {r}: " + " ".join(line), flush=True)
            med_read = float(np.median(results["read"]))
            print("\nFAST-WINDOW medians (GB/s, ratio vs read):", flush=True)
            for name in sel:
                med = float(np.median(results[name]))
                print(
                    f"  {name}: {med:.0f} GB/s ({med / med_read:.3f})",
                    flush=True,
                )
            # only count it if the window actually held through the battery
            sys.exit(0 if med_read >= 0.85 * THRESH else 4)
        time.sleep(POLL_S)
    print("deadline reached without a fast window", flush=True)
    sys.exit(3)


if __name__ == "__main__":
    main()
