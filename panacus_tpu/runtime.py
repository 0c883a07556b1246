"""JAX runtime configuration: persistent compilation cache + device info.

CLI invocations are short-lived processes; the persistent compilation cache
makes every run after the first skip XLA compilation entirely.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("panacus")

_CONFIGURED = False
_NUM_THREADS = 0  # 0 = all cores


def set_num_threads(n: int) -> None:
    """Host-side worker thread count (CLI -t; 0 = all cores). The TPU-native
    analogue of the reference's rayon pool size (src/lib.rs:55-67): it bounds
    the tokenizer thread pool; device parallelism is unaffected."""
    global _NUM_THREADS
    _NUM_THREADS = max(int(n), 0)
    log.info("running panacus on %d host threads", effective_threads())


def effective_threads() -> int:
    if _NUM_THREADS > 0:
        return _NUM_THREADS
    return os.cpu_count() or 1


_HEAP_CONFIGURED = False


def configure_host_memory() -> None:
    """Two host-memory mitigations for ballooned/lazy-memory VMs
    (firecracker with free-page reporting), where every fresh private-anon
    4 KiB page fault can cost ~0.3 ms — 12 MB/s effective:

    1. mallopt: keep freed large blocks in the process heap instead of
       returning them to the OS, so steady-state non-numpy temps reuse
       already-faulted pages (20x parser speedup on repeat passes).
    2. A custom numpy data allocator (native/npalloc.c via
       PyDataMem_SetHandler): large arrays come from 2 MiB-aligned mmap
       regions advised MADV_HUGEPAGE with a bounded reuse cache. Hugepage
       faults on fresh mmap VMAs run ~40x faster than 4 KiB faults
       (measured 390-1280 vs 15 MB/s first-touch) — this fixes the
       one-shot CLI cold start, which heap reuse cannot help. (The brk
       heap is no alternative: madvised heap ranges still fault 4 KiB at
       a time; khugepaged only collapses them afterwards.)

    Disable the allocator with PANACUS_TPU_NO_HUGEPAGES=1."""
    global _HEAP_CONFIGURED
    if _HEAP_CONFIGURED:
        return
    _HEAP_CONFIGURED = True
    try:
        import ctypes
        import ctypes.util

        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        M_MMAP_MAX = -4
        M_ARENA_MAX = -8
        libc.mallopt(M_MMAP_MAX, 0)
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        # one arena: worker-thread frees land back on the main heap where
        # the next pass's allocations (any thread) can reuse the pages —
        # non-main arenas trim to the OS and re-fault on a ballooned VM
        libc.mallopt(M_ARENA_MAX, 1)
    except Exception as e:  # pragma: no cover
        log.debug("mallopt tuning unavailable: %s", e)
    try:
        from .native import install_hugepage_allocator

        install_hugepage_allocator()
    except Exception as e:  # pragma: no cover
        log.debug("hugepage allocator unavailable: %s", e)


def configure_jax() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True
    configure_host_memory()
    cache_dir = os.environ.get(
        "PANACUS_TPU_JAX_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "panacus_tpu", "jax",
        ),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover
        log.debug("could not enable jax compilation cache: %s", e)


class phase_timer:
    """Wall-clock phase timing, logged at INFO — the counterpart of the
    reference's per-pass Instant timers (graph_broker/util.rs:45,194-199).
    Doubles as a JAX profiler trace scope when PANACUS_TPU_PROFILE=<dir>."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        import time

        self._t0 = time.perf_counter()
        self._trace_dir = os.environ.get("PANACUS_TPU_PROFILE")
        if self._trace_dir:
            try:
                import jax.profiler

                self._ann = jax.profiler.TraceAnnotation(self.name)
                self._ann.__enter__()
            except Exception:
                self._ann = None
        return self

    def __exit__(self, *exc):
        import time

        if self._trace_dir and getattr(self, "_ann", None) is not None:
            self._ann.__exit__(*exc)
        log.info(
            "phase %s done; time elapsed: %.3fs",
            self.name,
            time.perf_counter() - self._t0,
        )
        return False


def maybe_start_profiler() -> None:
    d = os.environ.get("PANACUS_TPU_PROFILE")
    if d:
        import jax.profiler

        os.makedirs(d, exist_ok=True)
        jax.profiler.start_trace(d)
        log.info("JAX profiler tracing to %s", d)


def maybe_stop_profiler() -> None:
    if os.environ.get("PANACUS_TPU_PROFILE"):
        import jax.profiler

        jax.profiler.stop_trace()


def device_summary() -> str:
    import jax

    devs = jax.devices()
    return f"{len(devs)}x {devs[0].device_kind}" if devs else "no devices"


# HBM peak bandwidth per chip, bytes/s (public TPU specs; used for the
# roofline fraction in bench.py)
_HBM_PEAK_GBPS = {
    "TPU v4": 1228,
    "TPU v5 lite": 819,  # v5e
    "TPU v5e": 819,
    "TPU v5": 2765,  # v5p
    "TPU v5p": 2765,
    "TPU v6 lite": 1640,  # v6e / Trillium
    "TPU v6e": 1640,
}


def hbm_peak_bytes_per_s(device) -> "float | None":
    kind = getattr(device, "device_kind", "")
    # longest-prefix match so "TPU v5 lite" doesn't hit "TPU v5"
    best = None
    for name, gbps in _HBM_PEAK_GBPS.items():
        if kind.startswith(name) and (best is None or len(name) > best[0]):
            best = (len(name), gbps)
    return best[1] * 1e9 if best else None


_LINK_PROFILE: "tuple | None" = None


def device_link_profile() -> "tuple[float, float]":
    """(bandwidth bytes/s, round-trip seconds) of the host<->accelerator
    link, measured once per process with a 1 MiB put+fetch.

    On direct-attached TPUs this is PCIe (>= 10 GB/s, sub-ms RTT) and the
    probe costs ~2 ms. On tunneled backends (axon pools) the link can be
    1000x slower — the counting-placement policy (ops.engine.count_device)
    uses this to decide whether shipping the membership matrix to the
    accelerator is worth it. Overrides: PANACUS_TPU_LINK_MBPS (skip the
    probe, use the given MB/s and a 1 ms RTT)."""
    global _LINK_PROFILE
    if _LINK_PROFILE is not None:
        return _LINK_PROFILE
    override = os.environ.get("PANACUS_TPU_LINK_MBPS")
    if override:
        _LINK_PROFILE = (float(override) * 1e6, 1e-3)
        return _LINK_PROFILE
    import threading
    import time

    import jax
    import numpy as np

    dev = jax.devices()[0]

    result: dict = {}

    def _probe() -> None:
        try:
            tiny = np.zeros(8, dtype=np.int32)
            blk = np.zeros(1 << 18, dtype=np.int32)  # 1 MiB
            # warm the transfer paths (shape setup is one-time on
            # tunneled backends)
            np.asarray(jax.device_put(tiny, dev))
            np.asarray(jax.device_put(blk, dev)[:8])
            rtts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(jax.device_put(tiny, dev))
                rtts.append(time.perf_counter() - t0)
            rtt = sorted(rtts)[1]
            t0 = time.perf_counter()
            np.asarray(jax.device_put(blk, dev)[:8])
            t_blk = time.perf_counter() - t0
            result["v"] = (blk.nbytes / max(t_blk - rtt, 1e-6), rtt)
        except Exception as e:  # pragma: no cover - backend failure
            result["e"] = e

    # Watchdog: tunneled backends can stall mid-transfer with no error and
    # no way to interrupt the blocked XLA call — run the probe in a daemon
    # thread and, on timeout, report a dead-slow link so the placement
    # policy keeps all counting on the host and the run never touches the
    # stalled device again (the abandoned thread dies with the process).
    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(float(os.environ.get("PANACUS_TPU_LINK_PROBE_S", "20")))
    if "v" not in result:
        log.warning(
            "device link probe %s; assuming dead-slow link (host placement)",
            "failed: %s" % result["e"] if "e" in result else "stalled",
        )
        _LINK_PROFILE = (1e6, 1.0)
        return _LINK_PROFILE
    bw, rtt = result["v"]
    _LINK_PROFILE = (bw, rtt)
    log.info(
        "device link: %.0f MB/s, RTT %.1f ms (%s)",
        bw / 1e6,
        rtt * 1e3,
        dev.device_kind,
    )
    return _LINK_PROFILE
