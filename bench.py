#!/usr/bin/env python
"""Benchmark: end-to-end histgrowth throughput on a synthetic pangenome
graph at HPRC-chr22 scale, plus a device-roofline stage.

Headline metric: `histgrowth -c all` (node+bp+edge hists and growth curves,
`-q 0,0.5,1.0 -l 0,1,2`) measured as GFA MB/s. Reference baseline: panacus
processes the 402 MB HPRC chr22 pggb graph in ~17 s (node) + ~79 s (edge)
(BASELINE.md) => 402/96 = 4.19 MB/s for the combined workload; vs_baseline
is our MB/s over that number.

Secondary stages (stderr): node-only histgrowth (r01 continuity; baseline
23.6 MB/s), edge-only (5.1 MB/s), gzip-input node histgrowth, and a
device-only popcount-hist roofline on a >=1 GiB on-device matrix reported
as a fraction of HBM speed-of-light (device_bw_frac in the JSON line).

Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "device_bw_frac", ...}.
The synthetic graph (deterministic, cached in /tmp) mimics an HPRC pggb
GFA: P- and W-lines dominate the bytes, 45 samples x 2 haplotypes = 90
haplotype groups, integer node names, short segments.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_ALL_MBPS = 402.0 / (17.0 + 79.0)
BASELINE_NODE_MBPS = 402.0 / 17.0
BASELINE_EDGE_MBPS = 402.0 / 79.0

N_NODES = int(os.environ.get("PANACUS_BENCH_NODES", 900_000))
N_PATHS = int(os.environ.get("PANACUS_BENCH_PATHS", 90))
MAX_GAP = 4
SEED = 7
GEN_VERSION = 5  # bump when make_graph changes
CACHE = f"/tmp/panacus_bench_v{GEN_VERSION}_{N_NODES}_{N_PATHS}_{SEED}.gfa"


def make_graph(path: str) -> None:
    """Deterministic pggb-like graph at chr22-pggb scale by default
    (~370 MB; the reference baseline graph is 402 MB): path lines dominate
    the bytes, integer node names, short segments. 45 samples x 2
    haplotypes; haplotype 0 is a P line (PanSN name), haplotype 1 a W line
    — HPRC graphs carry both spellings. Each path walks the node line with
    gaps in 1..MAX_GAP and every (u, u+g) pair is declared as an L line, so
    paths are edge-consistent by construction."""
    rng = np.random.default_rng(SEED)
    t0 = time.time()
    lens = rng.integers(1, 17, size=N_NODES)
    seq_pool = ("ACGT" * 5)[:16]
    n_edges = sum(N_NODES - g for g in range(1, MAX_GAP + 1))
    gap_pool = rng.integers(
        1, MAX_GAP + 1, size=N_NODES + N_PATHS, dtype=np.int64
    )

    def join_lines(parts, sep=b"\n"):
        return sep.join(parts.tolist()) + sep

    with open(path, "wb") as f:
        f.write(b"H\tVN:Z:1.0\n")
        names = np.arange(1, N_NODES + 1).astype("S12")
        seqs = np.array(
            [seq_pool[:k].encode() for k in range(1, 17)], dtype="S16"
        )[lens - 1]
        s_lines = np.char.add(np.char.add(b"S\t", names), b"\t")
        f.write(join_lines(np.char.add(s_lines, seqs)))
        del s_lines, seqs
        for g in range(1, MAX_GAP + 1):
            eu = names[: N_NODES - g]
            ev = names[g:]
            l_lines = np.char.add(
                np.char.add(np.char.add(b"L\t", eu), b"\t+\t"),
                np.char.add(ev, b"\t+\t0M"),
            )
            f.write(join_lines(l_lines))
            del l_lines
        for p in range(N_PATHS):
            sample, hap = p // 2, p % 2
            visits = 1 + np.cumsum(gap_pool[p : p + N_NODES])
            visits = visits[: np.searchsorted(visits, N_NODES, side="right")]
            if hap == 0:
                toks = np.char.add(visits.astype("S12"), b"+")
                f.write(f"P\ts{sample}#0#chr1\t".encode())
                f.write(join_lines(toks, sep=b",")[:-1])
                f.write(b"\t*\n")
            else:
                toks = np.char.add(b">", visits.astype("S12"))
                f.write(f"W\ts{sample}\t1\tchr1\t*\t*\t".encode())
                f.write(b"".join(toks.tolist()))
                f.write(b"\n")
    sys.stderr.write(
        f"[bench] generated {path}: {os.path.getsize(path) / 1e6:.1f} MB, "
        f"{n_edges} edges, in {time.time() - t0:.1f}s\n"
    )


def _broker_pieces(gfa: str, count_types, index_edges: bool):
    """GraphStorage -> mask -> streamed (or classic) abaci: the production
    counting path (panacus_tpu/stream.py + broker.py)."""
    from panacus_tpu.abacus import AbacusByTotal, path_order_groups
    from panacus_tpu.gfa import GraphStorage
    from panacus_tpu.itemize import itemize_paths
    from panacus_tpu.mask import GraphMask, GraphMaskParameters
    from panacus_tpu.stream import streamed_total_abaci

    t0 = time.time()
    g = GraphStorage(gfa, index_edges=index_edges)
    mask = GraphMask.from_datamgr(
        GraphMaskParameters(groupby_haplotype=True), g
    )
    t_index = time.time() - t0

    t1 = time.time()
    res = streamed_total_abaci(g, mask, count_types)
    if res is None:  # fallback: classic path
        itemized = itemize_paths(g, mask, count_types)
        path_order, groups = path_order_groups(mask, g.path_segments)
        abaci = {
            ct: AbacusByTotal.from_itemization(
                ct, slot, itemized, path_order, groups, g
            )
            for slot, ct in enumerate(count_types)
        }
    else:
        abaci = res[0]
    t_stream = time.time() - t1
    return g, abaci, (t_index, t_stream)


def _placement_of(engine) -> str:
    """Where the membership matrix actually lives: 'tpu-hbm' (committed to
    an accelerator), 'host-xla' (count_device kept it on the host backend),
    or 'sharded' (multi-device item sharding)."""
    dev = engine._m_device()
    if dev is None:
        return "sharded"
    return "tpu-hbm" if dev.platform in ("tpu", "axon") else "host-xla"


def run_histgrowth(gfa: str, count: str):
    """One histgrowth run. count: 'all' | 'node' | 'edge'. Returns
    (hists dict, growth count, phase times). Records the M placement of
    the last run in run_histgrowth.placement."""
    from panacus_tpu.hist import Hist
    from panacus_tpu.utils import CountType, ThresholdContainer

    counts = {
        "all": [CountType.NODE, CountType.BP, CountType.EDGE],
        "node": [CountType.NODE],
        "edge": [CountType.EDGE],
    }[count]
    g, abaci, (t_index, t_stream) = _broker_pieces(
        gfa, counts, index_edges=CountType.EDGE in counts
    )
    run_histgrowth.placement = _placement_of(next(iter(abaci.values())).engine)

    # device tail: every membership row is already HBM-resident after the
    # streamed build, so this is the fused hist dispatches + result fetch
    # (node + bp share one engine => one batched pass, see construct_hists)
    from panacus_tpu.abacus import construct_hists

    t2 = time.time()
    hists = {
        ct: Hist(ct, [int(x) for x in h])
        for ct, h in construct_hists(abaci).items()
    }
    t_tail = time.time() - t2

    t3 = time.time()
    tc = ThresholdContainer.parse_params("0,0.5,1.0", "0,1,2")
    n_growth = 0
    for h in hists.values():
        n_growth += len(h.calc_all_growths(tc))
    t_growth = time.time() - t3
    return hists, n_growth, (t_index, t_stream, t_tail, t_growth)


def _xor_read_bw(M, K=16):
    """Raw streaming ceiling of the SAME connection: a pallas xor-reduce
    over M (pure reads, no popcount/hist work).

    HISTORY (round 4): the original chain body was loop-INVARIANT
    (`run(M)` with constant M), so XLA hoisted the pass out of the
    fori_loop and every measurement was one pass + the tunnel RTT,
    reported as K*bytes/RTT — the 'fast/slow session windows' of rounds
    3-4 were exactly K=16 vs K=8 against a ~26 ms RTT, not real
    bandwidth. The body now takes a per-iteration operand row (like the
    hist chain's `w + i`), which defeats the hoist; chain wall time must
    scale with K for the number to be trusted (asserted below)."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(m_ref, w_ref, out_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        x = m_ref[:]
        r = x[0:1]
        for i in range(1, x.shape[0]):
            r = r ^ x[i : i + 1]
        acc[:] ^= r ^ w_ref[:]

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _o():
            out_ref[:] = jnp.sum(
                acc[:].astype(jnp.int32), axis=1, keepdims=True
            )

    @jax.jit
    def run(M, w):
        n_words, n_items = M.shape
        block = 16384
        return pl.pallas_call(
            kern,
            grid=(n_items // block,),
            in_specs=[
                pl.BlockSpec(
                    (n_words, block), lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, block), lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, block), jnp.uint32)],
        )(M, w)

    w = jnp.zeros((1, M.shape[1]), jnp.uint32)

    def make_chain(k):
        @jax.jit
        def chain(M, w):
            def body(i, acc):
                return acc + run(M, w + i.astype(jnp.uint32)).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return lambda: np.asarray(chain(M, w))

    return _slope_bw(make_chain, M.nbytes, K)


def _slope_bw(make_chain, nbytes, K):
    """Per-pass bandwidth via two chain lengths: wall(k) = k*t_pass + c
    where c is the tunnel round trip (~26 ms here) plus dispatch overhead.
    Timing ONE chain and dividing by k bakes c/k into every number — the
    entire 'session window' history (see _xor_read_bw) fell out of that
    bias. The slope (wall(3K) - wall(K)) / 2K cancels c exactly."""
    k1, k2 = K, 3 * K
    c1, c2 = make_chain(k1), make_chain(k2)
    c1()
    c2()  # compile + warm both
    t1 = []
    t2 = []
    for _ in range(3):
        t0 = time.perf_counter()
        c1()
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        c2()
        t2.append(time.perf_counter() - t0)
    dt = sorted(t2)[1] - sorted(t1)[1]
    if dt <= 0:
        return None
    return nbytes / (dt / (k2 - k1))


def run_roofline():
    """Device-only popcount-hist throughput of the pallas streaming kernel
    on a >=1 GiB on-device matrix (no host transfer in the timed region):
    operationalizes BASELINE.md's 'popcount-bandwidth speed of light'.
    Returns (bytes/s, frac of HBM peak) or None off-TPU.

    Timing note: on the tunneled backend block_until_ready can return
    before execution finishes, and a single fetch RTT (~30 ms) dwarfs the
    ~3 ms pass — so K passes are chained serially inside ONE jit (each
    iteration's weights depend on the loop counter, defeating CSE) and a
    single tiny result fetch bounds the whole chain."""
    import functools

    import jax
    import jax.numpy as jnp

    from panacus_tpu.ops import pallas_kernels as pk
    from panacus_tpu.runtime import hbm_peak_bytes_per_s

    dev = jax.devices()[0]
    peak = hbm_peak_bytes_per_s(dev)
    if dev.platform not in ("tpu", "axon") or peak is None:
        sys.stderr.write(
            f"[bench] roofline: skipped ({dev.device_kind} is not a "
            "known-peak TPU)\n"
        )
        return None
    n_words, n_items = 32, 1 << 23  # 1024 groups x 8.4M items = 1.07 GB
    n_bins = n_words * 32 + 2
    K = 16
    M = jax.random.bits(jax.random.PRNGKey(0), (n_words, n_items), jnp.uint32)
    w = jax.random.randint(
        jax.random.PRNGKey(1), (1, n_items), 0, 1 << 20, dtype=jnp.int32
    )

    def make_kernel_chain(k):
        @jax.jit
        def chain(M, w):
            def body(i, acc):
                return acc + pk.fused_hist_tpu(M, w + i, n_bins).sum()

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return lambda: np.asarray(chain(M, w))

    # RTT-free slope timing (see _slope_bw: dividing one chain's wall by K
    # bakes the ~26 ms round trip into the number)
    bw = _slope_bw(make_kernel_chain, M.nbytes, K)
    if bw is None:
        sys.stderr.write("[bench] roofline: slope timing failed\n")
        return None
    frac = bw / peak
    # same-connection A/B of the MXU coverage reduction
    bw_mxu = None
    if not os.environ.get("PANACUS_TPU_COV"):
        try:
            os.environ["PANACUS_TPU_COV"] = "mxu"
            pk.fused_hist_tpu.clear_cache()
            bw_mxu = _slope_bw(make_kernel_chain, M.nbytes, K)
        except Exception as e:  # pragma: no cover - lowering failure
            sys.stderr.write(f"[bench] mxu-cov roofline failed: {e}\n")
        finally:
            os.environ.pop("PANACUS_TPU_COV", None)
            pk.fused_hist_tpu.clear_cache()
    try:
        read_bw = _xor_read_bw(M)
    except Exception as e:  # pragma: no cover - lowering failure
        sys.stderr.write(f"[bench] xor read ceiling failed: {e}\n")
        read_bw = None
    sys.stderr.write(
        f"[bench] roofline ({dev.device_kind}): {M.nbytes / 1e6:.0f} MB "
        f"weighted hist => {bw / 1e9:.0f} GB/s = "
        f"{frac:.2f} of HBM peak ({peak / 1e9:.0f} GB/s)"
        + (
            f"; mxu-cov variant {bw_mxu / 1e9:.0f} GB/s"
            if bw_mxu
            else ""
        )
        + (
            f"; raw xor read {read_bw / 1e9:.0f} GB/s => kernel at "
            f"{bw / read_bw:.2f} of the connection's streaming ceiling\n"
            if read_bw
            else "\n"
        )
    )
    run_roofline.bw_mxu = bw_mxu
    return bw, frac, read_bw


def _timed_stage(name, fn, size_mb, baseline, reps=6):
    """Warm-up + best-of-reps wall clock; logs phases; returns best MB/s."""
    import gc

    fn()  # warm-up: compile cache, transfer shapes, page heat
    best = None
    for rep in range(reps):
        gc.collect()
        t0 = time.time()
        _, _, phases = fn()
        wall = time.time() - t0
        sys.stderr.write(
            f"[bench] {name} pass {rep}: {size_mb:.1f} MB in {wall:.2f}s "
            f"(index {phases[0]:.2f}s, stream {phases[1]:.2f}s, "
            f"device-tail {phases[2]:.3f}s, growth {phases[3]:.2f}s)\n"
        )
        if best is None or wall < best:
            best = wall
    mbps = size_mb / best
    sys.stderr.write(
        f"[bench] {name}: {mbps:.1f} MB/s "
        f"(reference {baseline:.1f} MB/s => {mbps / baseline:.1f}x)\n"
    )
    return mbps



def _host_memory_health() -> float:
    """Fresh-anon-page touch throughput (MB/s): this firecracker VM's
    balloon intermittently degrades page-fault service from microseconds
    to ~0.15 ms/4K page (>100x), which tanks every allocation-heavy stage
    regardless of code. Recording it makes a bad-window artifact
    interpretable: ~2000+ MB/s is a healthy window, <500 is degraded."""
    n = 64 << 20
    t0 = time.time()
    b = bytearray(n)
    mv = memoryview(b)
    for i in range(0, n, 4096):
        mv[i] = 1
    dt = time.time() - t0
    del mv, b
    return round(n / 1e6 / max(dt, 1e-9), 0)

def run_inner() -> None:
    """Generate + warm up + measure + print the JSON line. Run inside a
    bounded subprocess by main(), because TPU-tunnel backends can stall
    arbitrarily long in compilation."""
    if not os.path.exists(CACHE):
        make_graph(CACHE)
    size_mb = os.path.getsize(CACHE) / 1e6
    mem_health = _host_memory_health()
    sys.stderr.write(f"[bench] host fresh-page touch: {mem_health:.0f} MB/s\n")

    stages = {}
    # headline: -c all (node+bp+edge hists + 3 growth curves each)
    mbps_all = _timed_stage(
        "histgrowth -c all",
        lambda: run_histgrowth(CACHE, "all"),
        size_mb,
        BASELINE_ALL_MBPS,
    )
    placement = getattr(run_histgrowth, "placement", "unknown")
    stages["all"] = round(mbps_all, 1)

    # continuity stages
    try:
        stages["node"] = round(
            _timed_stage(
                "histgrowth node",
                lambda: run_histgrowth(CACHE, "node"),
                size_mb,
                BASELINE_NODE_MBPS,
                reps=4,
            ),
            1,
        )
        stages["edge"] = round(
            _timed_stage(
                "histgrowth edge",
                lambda: run_histgrowth(CACHE, "edge"),
                size_mb,
                BASELINE_EDGE_MBPS,
                reps=4,
            ),
            1,
        )
    except Exception as e:
        sys.stderr.write(f"[bench] secondary stage failed: {e}\n")

    # gzip-input stage (libdeflate inflate; MB/s on uncompressed bytes)
    try:
        gz = CACHE + ".gz"
        if not os.path.exists(gz):
            import subprocess

            t0 = time.time()
            subprocess.run(["gzip", "-1", "-k", "-f", CACHE], check=True)
            sys.stderr.write(
                f"[bench] gzipped graph in {time.time() - t0:.1f}s "
                f"({os.path.getsize(gz) / 1e6:.0f} MB)\n"
            )
        stages["gz_node"] = round(
            _timed_stage(
                "histgrowth node (gz input)",
                lambda: run_histgrowth(gz, "node"),
                size_mb,
                BASELINE_NODE_MBPS,
                reps=4,
            ),
            1,
        )
    except Exception as e:
        sys.stderr.write(f"[bench] gz stage failed: {e}\n")

    out = {
        "metric": "histgrowth_all_throughput",
        "value": round(mbps_all, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps_all / BASELINE_ALL_MBPS, 3),
        # where the membership matrix actually lived during the headline
        # run — "tpu-hbm" means TPU compute, "host-xla" means the adaptive
        # placement policy kept counting on the host (slow tunnel link)
        "placement": placement,
        "stages": stages,
        "host_mem_mbps": mem_health,
    }
    # flush the end-to-end result BEFORE the roofline: the roofline talks
    # to the accelerator directly and can stall on a dead tunnel; the
    # orchestrator merges every JSON line (and salvages partial stdout on
    # timeout), so the stage numbers survive a roofline hang
    print(json.dumps(out), flush=True)

    # device roofline
    frac = None
    bw = None
    read_bw = None
    try:
        r = run_roofline()
        if r is not None:
            bw, frac, read_bw = r
    except Exception as e:
        sys.stderr.write(f"[bench] roofline failed: {e}\n")

    if frac is not None:
        out["device_bw_frac"] = round(frac, 3)
        out["device_bw_gbps"] = round(bw / 1e9, 1)
        bw_mxu = getattr(run_roofline, "bw_mxu", None)
        if bw_mxu:
            out["device_bw_mxu_gbps"] = round(bw_mxu / 1e9, 1)
        if read_bw:
            # fraction of the SAME session's measured raw-read ceiling —
            # the honest speed-of-light number (tunnel session throughput
            # drifts, so nameplate fractions conflate kernel quality with
            # session luck)
            out["device_read_gbps"] = round(read_bw / 1e9, 1)
            out["device_frac_of_read"] = round(bw / read_bw, 3)
    print(json.dumps(out))


def run_inner_tpu() -> None:
    """TPU-HBM-resident end-to-end artifact: force the placement policy to
    the accelerator (PANACUS_TPU_FORCE_DEVICE) and run the PRODUCTION
    counting path on the bench graph — streamed row feed with async
    upload, pallas fused hist, growth curves, plus ordered growth and
    similarity through the group abacus on the same resident engine.
    Emits its own JSON line with placement (must be tpu-hbm) + stages."""
    os.environ["PANACUS_TPU_FORCE_DEVICE"] = "1"
    if not os.path.exists(CACHE):
        make_graph(CACHE)
    size_mb = os.path.getsize(CACHE) / 1e6
    mem_health = _host_memory_health()
    sys.stderr.write(f"[bench] host fresh-page touch: {mem_health:.0f} MB/s\n")

    stages = {}
    mbps_all = _timed_stage(
        "histgrowth -c all (tpu-resident)",
        lambda: run_histgrowth(CACHE, "all"),
        size_mb,
        BASELINE_ALL_MBPS,
        reps=3,
    )
    placement = getattr(run_histgrowth, "placement", "unknown")
    stages["all"] = round(mbps_all, 1)
    out = {
        "metric": "histgrowth_all_throughput",
        "value": round(mbps_all, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps_all / BASELINE_ALL_MBPS, 3),
        "placement": placement,
        "stages": stages,
        "forced_device": True,
        "host_mem_mbps": mem_health,
    }
    # the tunnel RTT dominates the tpu-resident gap vs the host attempt;
    # record the live link profile so the orchestrator can publish a
    # dispatch-count accounting (excess seconds / RTT) per stage
    try:
        from panacus_tpu.runtime import device_link_profile

        bw_link, rtt = device_link_profile()
        out["link_mbps"] = round(bw_link / 1e6, 1)
        out["rtt_s"] = round(rtt, 4)
    except Exception as e:
        sys.stderr.write(f"[bench] link profile failed: {e}\n")
    # flush before the group-abacus tail (it compiles more programs over
    # the tunnel and could stall; the orchestrator salvages partial lines)
    print(json.dumps(out), flush=True)

    # full stage table (the host attempt records these; the tpu-resident
    # artifact must be comparable stage by stage, not just on "all")
    for sname, count, src in (
        ("node", "node", CACHE),
        ("edge", "edge", CACHE),
        ("gz_node", "node", CACHE + ".gz"),
    ):
        try:
            if not os.path.exists(src):
                continue
            stages[sname] = round(
                _timed_stage(
                    f"histgrowth {sname} (tpu-resident)",
                    lambda c=count, s=src: run_histgrowth(s, c),
                    size_mb,
                    BASELINE_NODE_MBPS
                    if count == "node"
                    else BASELINE_EDGE_MBPS,
                    reps=2,
                ),
                1,
            )
            print(json.dumps(out), flush=True)
        except Exception as e:
            sys.stderr.write(f"[bench] tpu stage {sname} failed: {e}\n")

    try:
        from panacus_tpu.broker import GraphBroker, GraphState, Req
        from panacus_tpu.config import Grouping
        from panacus_tpu.utils import CountType, Threshold

        gb = GraphBroker()
        t0 = time.time()
        gb.change_graph_state(
            GraphState(
                graph=CACHE, name="bench", grouping=Grouping.haplotype()
            ),
            {
                Req.graph(CACHE),
                Req.NODE,
                Req.HIST,
                Req.abacus_by_group(CountType.NODE),
            },
            nice=False,
        )
        t_build = time.time() - t0
        ab = gb.get_abacus_by_group()
        group_placement = _placement_of(ab.engine)
        # first calls pay one-time compilation over the tunnel; report both
        # (cold includes compile+dispatch, warm is the steady-state cost)
        t1 = time.time()
        og = ab.calc_growth(Threshold.absolute(1), Threshold.rel(0.0))
        t_ordered_cold = time.time() - t1
        t1 = time.time()
        og = ab.calc_growth(Threshold.absolute(1), Threshold.rel(0.0))
        t_ordered = time.time() - t1
        t2 = time.time()
        inter, _sizes = ab.similarity_matrix()
        t_sim_cold = time.time() - t2
        t2 = time.time()
        inter, _sizes = ab.similarity_matrix()
        t_sim = time.time() - t2
        out["group_stages"] = {
            "placement": group_placement,
            "build_s": round(t_build, 2),
            "ordered_cold_s": round(t_ordered_cold, 2),
            "ordered_s": round(t_ordered, 3),
            "similarity_cold_s": round(t_sim_cold, 2),
            "similarity_s": round(t_sim, 3),
            "ordered_last": float(og[-1]),
            "sim_trace": float(np.asarray(inter).trace()),
        }
        sys.stderr.write(
            f"[bench] tpu-resident group abacus: ordered {t_ordered:.2f}s, "
            f"similarity {t_sim:.2f}s (placement {group_placement})\n"
        )

        # ASSERT the device outputs against an independent host oracle
        # (pure numpy from the tokenized runs, no jax): a wrong answer
        # from the device ordered-growth / similarity programs must fail
        # the attempt, not produce a green artifact
        g = gb.graph_aux
        po = gb._path_order
        n_groups_g = len(ab.groups)
        n_items = g.number_of_items(CountType.NODE)
        mem = np.zeros((n_groups_g, n_items + 1), dtype=bool)
        batch = g.all_path_item_runs()
        if batch is not None:
            b_ids, _bo, b_pref, _bb = batch
            for pid_, gi_ in po:
                mem[gi_, b_ids[b_pref[pid_] : b_pref[pid_ + 1]]] = True
        else:
            for pid_, gi_ in po:
                run_ids, _ = g.path_item_run(pid_)
                mem[gi_, run_ids] = True
        mem[:, 0] = False
        seen = np.zeros(n_items + 1, dtype=bool)
        og_exp = np.empty(n_groups_g, dtype=np.float64)
        for gi_ in range(n_groups_g):
            seen |= mem[gi_]
            og_exp[gi_] = float(seen.sum())
        ver_ordered = bool(
            np.array_equal(np.asarray(og, dtype=np.float64), og_exp)
        )
        inter_np = np.asarray(inter)
        diag = mem.sum(axis=1)
        ver_sim = bool(
            np.array_equal(
                np.diagonal(inter_np).astype(np.int64), diag.astype(np.int64)
            )
        )
        for a_, b_ in (
            (0, 1),
            (0, n_groups_g // 2),
            (n_groups_g - 2, n_groups_g - 1),
        ):
            want = int((mem[a_] & mem[b_]).sum())
            ver_sim = ver_sim and int(inter_np[a_, b_]) == want
        out["group_stages"]["verified"] = bool(ver_ordered and ver_sim)
        if not (ver_ordered and ver_sim):
            out["verify_failed"] = True
            sys.stderr.write(
                "[bench] TPU-RESIDENT VERIFY FAILED: "
                f"ordered_ok={ver_ordered} sim_ok={ver_sim} "
                f"(device og[-1]={float(og[-1])}, host={og_exp[-1]})\n"
            )
        else:
            sys.stderr.write(
                "[bench] tpu-resident group outputs verified against the "
                "host oracle (ordered vector + similarity diag/entries)\n"
            )
    except Exception as e:
        sys.stderr.write(f"[bench] tpu-resident group stage failed: {e}\n")
    print(json.dumps(out))


def run_inner_cross() -> None:
    """Validate the count_device crossover model (ops/engine.py:
    t_accel = bytes/link_bw + 4*rtt vs t_host = 2*bytes/1e9) against
    MEASUREMENT at several matrix sizes — the placement policy's two
    sides, timed for real: upload + popcount-coverage + reduce fetch on
    the accelerator vs the same program on the host XLA backend. Emits
    one JSON line {"crossover": [...]} with model and measured seconds
    and whether the model picks the faster side."""
    import jax
    import jax.numpy as jnp

    from panacus_tpu.ops.engine import coverage_from_membership
    from panacus_tpu.runtime import device_link_profile

    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        print(json.dumps({"crossover": []}))
        return
    cpu = jax.devices("cpu")[0]
    bw, rtt = device_link_profile()

    @jax.jit
    def count(M):
        return coverage_from_membership(M).astype(jnp.int64).sum()

    def measure(M_host, device):
        def once():
            Md = jax.device_put(M_host, device)
            return int(count(Md))

        once()  # compile + page heat
        best = None
        for _ in range(3):
            t0 = time.time()
            once()
            t = time.time() - t0
            best = t if best is None or t < best else best
        return best

    rng = np.random.default_rng(0)
    rows = []
    for mb in (4, 16, 56):
        n_items = mb * (1 << 20) // (3 * 4)
        M_host = rng.integers(
            0, 2**32, size=(3, n_items), dtype=np.uint32
        )
        m_bytes = M_host.nbytes
        t_dev = measure(M_host, dev)
        t_host = measure(M_host, cpu)
        model_dev = m_bytes / bw + 4 * rtt
        model_host = 2.0 * m_bytes / 1.0e9
        rows.append(
            {
                "size_mb": round(m_bytes / 1e6, 1),
                "model_device_s": round(model_dev, 3),
                "meas_device_s": round(t_dev, 3),
                "model_host_s": round(model_host, 3),
                "meas_host_s": round(t_host, 3),
                "model_picks_host": bool(model_dev > model_host),
                "host_actually_faster": bool(t_dev > t_host),
            }
        )
        sys.stderr.write(f"[bench] crossover {rows[-1]}\n")
    print(
        json.dumps(
            {
                "crossover": rows,
                "link_mbps": round(bw / 1e6, 1),
                "rtt_s": round(rtt, 4),
            }
        )
    )


def run_probe() -> None:
    """Minimal accelerator liveness check: a real transfer + compute.
    Tunneled backends can enumerate devices instantly yet stall on the
    first material transfer — probe the pattern the bench actually uses."""
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        print("probe: not-accelerator")
        return
    x = jax.device_put(np.zeros(2 * 1024 * 1024, dtype=np.uint32), dev)
    y = jnp.bitwise_count(x).astype(jnp.uint32).sum()
    y.block_until_ready()
    print("probe: ok")


def run_roofline_only() -> None:
    """Roofline-only inner mode: a second chance at the device kernel
    numbers when the full default-backend attempt stalled."""
    if not os.path.exists(CACHE):
        make_graph(CACHE)
    out = {}
    r = run_roofline()
    if r is not None:
        bw, frac, read_bw = r
        out["device_bw_frac"] = round(frac, 3)
        out["device_bw_gbps"] = round(bw / 1e9, 1)
        bw_mxu = getattr(run_roofline, "bw_mxu", None)
        if bw_mxu:
            out["device_bw_mxu_gbps"] = round(bw_mxu / 1e9, 1)
        if read_bw:
            out["device_read_gbps"] = round(read_bw / 1e9, 1)
            out["device_frac_of_read"] = round(bw / read_bw, 3)
    print(json.dumps(out))


def main() -> None:
    """Orchestrate: try the default backend (TPU) in a bounded subprocess;
    fall back to CPU if it stalls or fails. Always emits one JSON line."""
    import subprocess

    if "--inner-tpu" in sys.argv:
        run_inner_tpu()
        return
    if "--inner-cross" in sys.argv:
        run_inner_cross()
        return
    if "--inner" in sys.argv:
        run_inner()
        return
    if "--probe" in sys.argv:
        run_probe()
        return
    if "--roofline-only" in sys.argv:
        run_roofline_only()
        return

    # generate (or reuse) the graph before the bounded attempts so the
    # one-time generation cost never eats an attempt's budget
    if not os.path.exists(CACHE):
        make_graph(CACHE)

    budget = int(os.environ.get("PANACUS_BENCH_TIMEOUT", "900"))
    # heap-reuse tunables: fresh page faults can be ~0.3ms each on
    # ballooned VMs (see runtime.configure_host_memory)
    malloc_env = {
        "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
        "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
        "MALLOC_MMAP_MAX_": "0",
    }
    default_env = dict(os.environ, **malloc_env)

    def bounded(mode: str, env, t: int):
        return subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            env=env,
            timeout=t,
            capture_output=True,
            text=True,
        )

    # liveness gate: the tunnel can enumerate devices instantly yet stall
    # on the first real transfer — burning the whole attempt budget. A
    # bounded probe decides whether the default-backend attempt is worth
    # it (PANACUS_BENCH_PROBE_TIMEOUT seconds; raise it for links whose
    # first compile+transfer is slow but alive).
    probe_budget = int(os.environ.get("PANACUS_BENCH_PROBE_TIMEOUT", "90"))
    probe_ok = True
    try:
        pr = bounded("--probe", default_env, probe_budget)
        probe_ok = pr.returncode == 0 and "probe:" in pr.stdout
        if not probe_ok:
            sys.stderr.write(
                f"[bench] accelerator probe failed (rc={pr.returncode})\n"
            )
    except subprocess.TimeoutExpired:
        probe_ok = False
        sys.stderr.write("[bench] accelerator probe stalled; skipping "
                         "default-backend attempt\n")

    attempts = []
    if probe_ok:
        attempts.append(("default backend", "--inner", default_env, budget))
        # tpu-resident validation attempt: forces M into HBM and runs the
        # full production path (stream feed -> pallas hist -> growth ->
        # ordered -> similarity); recorded separately, never the headline
        tpu_env = dict(default_env, PANACUS_TPU_FORCE_DEVICE="1")
        attempts.append(
            ("tpu resident", "--inner-tpu", tpu_env, min(budget, 600))
        )
    cpu_env = dict(default_env)
    cpu_env["JAX_PLATFORMS"] = "cpu"
    cpu_env.pop("PALLAS_AXON_POOL_IPS", None)
    attempts.append(("cpu host", "--inner", cpu_env, budget))

    # run every backend and report the best end-to-end throughput; the
    # roofline fields always come from the accelerator attempt, and every
    # attempt's placement + stage table is preserved so "default backend
    # wins" can never be misread as TPU-compute wins when the adaptive
    # policy kept M on the host
    results = []
    device_fields = {}
    attempt_summaries = {}
    tpu_resident = None
    for name, mode, env, t in attempts:
        sys.stderr.write(f"[bench] attempt: {name} (timeout {t}s)\n")
        salvaged = False
        try:
            r = bounded(mode, env, t)
            stdout, stderr, rc = r.stdout, r.stderr, r.returncode
        except subprocess.TimeoutExpired as te:
            # the inner prints (and flushes) its end-to-end JSON before
            # the roofline, so a roofline hang still leaves stage numbers
            # in the partial stdout
            stdout = (te.stdout or b"")
            stderr = (te.stderr or b"")
            if isinstance(stdout, bytes):
                stdout = stdout.decode(errors="replace")
            if isinstance(stderr, bytes):
                stderr = stderr.decode(errors="replace")

            def _parseable(ln):
                try:
                    return "value" in json.loads(ln)
                except ValueError:
                    return False

            # only a COMPLETE stage line counts (a SIGKILL mid-print can
            # leave a truncated '{...' fragment)
            rc = 0 if any(
                ln.startswith("{") and _parseable(ln)
                for ln in stdout.splitlines()
            ) else -1
            salvaged = rc == 0
            sys.stderr.write(
                f"[bench] {name} timed out"
                + (" (salvaged partial results)\n" if salvaged else "\n")
            )
            if rc != 0:
                # surface the child's stderr even when the attempt is
                # unsalvageable — that's exactly when diagnostics matter
                sys.stderr.write(stderr)
                continue
        sys.stderr.write(stderr)
        # merge every JSON line (stage line first, then the roofline-
        # augmented final line when the roofline completed)
        parsed = {}
        for ln in stdout.splitlines():
            if ln.startswith("{"):
                try:
                    parsed.update(json.loads(ln))
                except ValueError:
                    pass
        if rc == 0 and "value" in parsed:
            if "device_bw_frac" in parsed:
                device_fields = {
                    k: parsed[k]
                    for k in (
                        "device_bw_frac",
                        "device_bw_gbps",
                        "device_read_gbps",
                        "device_frac_of_read",
                    )
                    if k in parsed
                }
            attempt_summaries[name] = {
                "value": parsed["value"],
                "placement": parsed.get("placement", "unknown"),
                "stages": parsed.get("stages", {}),
                **(
                    {"host_mem_mbps": parsed["host_mem_mbps"]}
                    if "host_mem_mbps" in parsed
                    else {}
                ),
            }
            if name == "tpu resident":
                # validation artifact (M in HBM end-to-end), not a headline
                # candidate — the host path is expected to win on a slow
                # tunnel and that must stay visible
                tpu_resident = {
                    k: parsed[k]
                    for k in (
                        "value",
                        "placement",
                        "stages",
                        "group_stages",
                        "link_mbps",
                        "rtt_s",
                        "verify_failed",
                        "crossover",
                    )
                    if k in parsed
                }
            else:
                results.append((name, parsed))
            sys.stderr.write(
                f"[bench] {name}: {parsed['value']} MB/s "
                f"(M placement: {parsed.get('placement')})\n"
            )
        else:
            sys.stderr.write(f"[bench] {name} failed (rc={rc})\n")
    # roofline second chance: the device-kernel numbers are independent of
    # the end-to-end attempts, so if the default attempt stalled mid-way
    # (device_fields empty) but the tunnel probed alive, try just the
    # roofline with its own budget
    if probe_ok and not device_fields:
        sys.stderr.write("[bench] roofline-only retry\n")
        try:
            # bounded tighter than a full attempt: the retry only exists
            # for the stall case, where both attempts may already have
            # burned their budgets
            r = bounded("--roofline-only", default_env, min(budget, 300))
            line = None
            for ln in r.stdout.splitlines():
                if ln.startswith("{"):
                    line = ln
            if r.returncode == 0 and line:
                device_fields = {
                    k: v
                    for k, v in json.loads(line).items()
                    if k.startswith("device_")
                }
        except subprocess.TimeoutExpired:
            sys.stderr.write("[bench] roofline-only retry timed out\n")
    # tpu-marked hardware test status (gated on the same probe): record
    # pass/fail in the bench JSON so every round carries the evidence
    tpu_tests = None
    if probe_ok and not os.environ.get("PANACUS_BENCH_SKIP_TPU_TESTS"):
        test_env = dict(default_env, PANACUS_TEST_TPU="1")
        try:
            tr = subprocess.run(
                [sys.executable, "-m", "pytest", "tests", "-m", "tpu", "-q"],
                env=test_env,
                timeout=int(
                    os.environ.get("PANACUS_BENCH_TPU_TEST_TIMEOUT", "600")
                ),
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            lines = [ln for ln in tr.stdout.strip().splitlines() if ln]
            tpu_tests = {
                "rc": tr.returncode,
                "summary": (lines[-1] if lines else "")[-160:],
            }
        except subprocess.TimeoutExpired:
            tpu_tests = {"rc": -1, "summary": "timed out"}
        sys.stderr.write(f"[bench] pytest -m tpu: {tpu_tests}\n")

    # crossover-model validation (count_device placement policy): its own
    # bounded run so a stall can't eat the attempt budgets
    if probe_ok and tpu_resident is not None:
        try:
            r = bounded("--inner-cross", default_env, min(budget, 300))
            sys.stderr.write(r.stderr)
            for ln in r.stdout.splitlines():
                if ln.startswith("{"):
                    try:
                        d = json.loads(ln)
                    except ValueError:
                        continue
                    if "crossover" in d:
                        tpu_resident["crossover"] = d["crossover"]
                        tpu_resident.setdefault("rtt_s", d.get("rtt_s"))
                        tpu_resident.setdefault(
                            "link_mbps", d.get("link_mbps")
                        )
        except subprocess.TimeoutExpired:
            sys.stderr.write("[bench] crossover validation timed out\n")

    # RTT accounting: the tpu-resident attempt pays the tunnel's round
    # trip on every dispatch; express each stage's gap vs the host attempt
    # as implied dispatch count (excess seconds / RTT) so the artifact
    # shows whether the gap is fully explained by dispatch latency
    if tpu_resident is not None and tpu_resident.get("rtt_s"):
        host = attempt_summaries.get("cpu host") or attempt_summaries.get(
            "default backend"
        )
        size_mb = os.path.getsize(CACHE) / 1e6
        if host:
            rtt = tpu_resident["rtt_s"]
            acct = {}
            for sname, tpu_mbps in tpu_resident.get("stages", {}).items():
                host_mbps = host.get("stages", {}).get(sname)
                if not host_mbps or not tpu_mbps:
                    continue
                excess = size_mb / tpu_mbps - size_mb / host_mbps
                acct[sname] = {
                    "excess_s": round(excess, 2),
                    "implied_dispatches": round(excess / rtt, 1),
                }
            tpu_resident["rtt_accounting"] = {
                "rtt_s": rtt,
                "vs_backend": "cpu host" if "cpu host" in attempt_summaries
                else "default backend",
                "stages": acct,
            }
            sys.stderr.write(
                f"[bench] tpu-resident rtt accounting: {acct}\n"
            )

    if results:
        best_name, best = max(results, key=lambda kv: kv[1]["value"])
        sys.stderr.write(f"[bench] best backend: {best_name}\n")
        best.update(device_fields)
        best["backend"] = best_name
        best["attempts"] = attempt_summaries
        if tpu_resident is not None:
            best["tpu_resident"] = tpu_resident
        if tpu_tests is not None:
            best["tpu_tests"] = tpu_tests
        print(json.dumps(best))
        return
    # last resort: report zero throughput rather than nothing
    print(
        json.dumps(
            {
                "metric": "histgrowth_all_throughput",
                "value": 0.0,
                "unit": "MB/s",
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
