"""Interleaved same-process kernel measurement (TPU hardware).

HISTORICAL NOTE (round 4): the "drifting window" this script was built
to bracket turned out to be a measurement artifact — chain-wall/K
timing amortizes the tunnel's ~26 ms RTT into every pass, and the old
read control was loop-hoisted entirely (BASELINE.md post-mortem). The
`read` variant is now slope-timed; kernel variants remain single-chain
(RELATIVE ordering is still meaningful, absolute GB/s is biased low by
the shared RTT constant). Resolved truth: the production kernel is at
0.998 of the raw streaming ceiling — all formulations are memory-bound.

This runs ALL requested variants round-robin inside ONE process: every
round times every variant back-to-back within a few seconds.

    python scripts/kernel_interleave.py [rounds] [variant ...]

Defaults: 5 rounds of read pc pcm fh21 fhm1 fh23 fhm3 cur1 cur3.
Prints per-round GB/s and a median summary with read-normalized ratios.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from panacus_tpu import runtime
runtime.configure_jax()
import jax, jax.numpy as jnp, numpy as np


def _load_probe_funcs():
    """Re-create the probe kernels without executing kernel_probe's CLI.

    Deliberate duplication: kernel_probe.py runs its CLI at import time,
    and both scripts are frozen measurement-methodology history (see the
    module docstring) — the PRODUCTION formulations live solely in
    panacus_tpu/ops/pallas_kernels.py."""
    import functools
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from panacus_tpu.ops import pallas_kernels as pk

    n_words, n_items = 32, 1 << 23
    M = jax.random.bits(jax.random.PRNGKey(0), (n_words, n_items), jnp.uint32)
    w = jax.random.randint(
        jax.random.PRNGKey(1), (1, n_items), 0, 1 << 20, dtype=jnp.int32
    )
    n_bins = n_words * 32 + 2
    K = 8
    B = pk.BLOCK_ITEMS
    FINE = pk.FINE

    import bench

    def read_fn():
        # slope-timed since round 4 (the pre-fix read chain was hoisted to
        # one pass and reported K*bytes/RTT — see BASELINE.md); 0.0 when
        # the slope is unmeasurable
        return bench._xor_read_bw(M, K=max(K, 16)) or 0.0

    def _pc_kernel(m_ref, w_ref, out_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        cov = jnp.sum(
            jax.lax.population_count(m_ref[:]).astype(jnp.int32),
            axis=0, keepdims=True,
        )
        acc[:] += cov + (w_ref[:] & 1)
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _o():
            out_ref[:] = acc[:]

    def _pcx_kernel(m_ref, w_ref, out_ref, acc):
        # control: popcount replaced by a plain cast — same structure,
        # same reduction, no popcount instruction. pcx vs pc isolates
        # what the popcount op itself costs on the VPU.
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        cov = jnp.sum(
            m_ref[:].astype(jnp.int32), axis=0, keepdims=True
        )
        acc[:] += cov + (w_ref[:] & 1)
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _o():
            out_ref[:] = acc[:]

    def _pcm_kernel(m_ref, w_ref, out_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
        pcv = (
            jax.lax.population_count(m_ref[:])
            .astype(jnp.int32).astype(jnp.bfloat16)
        )
        ones = jnp.ones((1, pcv.shape[0]), jnp.bfloat16)
        cov = jax.lax.dot_general(
            ones, pcv, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        acc[:] += cov + (w_ref[:] & 1)
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _o():
            out_ref[:] = acc[:]

    def _simple(kern):
        def run(Mx, wx):
            return pl.pallas_call(
                kern, grid=(n_items // B,),
                in_specs=[
                    pl.BlockSpec((n_words, B), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, B), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, B), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
                scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
            )(Mx, wx)
        return run

    def _fh2_kernel(m_ref, w_ref, out_ref, acc_lo, acc_hi, n_limbs, mxu_cov):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_lo[:] = jnp.zeros_like(acc_lo)
            acc_hi[:] = jnp.zeros_like(acc_hi)
        if mxu_cov:
            pcv = (
                jax.lax.population_count(m_ref[:])
                .astype(jnp.int32).astype(jnp.bfloat16)
            )
            ones = jnp.ones((1, pcv.shape[0]), jnp.bfloat16)
            cov = jax.lax.dot_general(
                ones, pcv, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
        else:
            cov = jnp.sum(
                jax.lax.population_count(m_ref[:]).astype(jnp.int32),
                axis=0, keepdims=True,
            )
        n_vecs = w_ref.shape[0]
        n_rows = n_limbs * n_vecs
        n_coarse = acc_lo.shape[0] // n_rows
        fine_eq = (cov & (FINE - 1)) == jax.lax.broadcasted_iota(
            jnp.int32, (FINE, B), 0)
        coarse_oh = ((cov >> 5) == jax.lax.broadcasted_iota(
            jnp.int32, (n_coarse, B), 0)).astype(jnp.bfloat16)
        for v in range(n_vecs):
            wv = w_ref[v:v + 1, :]
            for j in range(n_limbs):
                wl = (wv >> (8 * j)) & 0xFF
                wf = jnp.where(fine_eq, wl, 0).astype(jnp.bfloat16)
                p = jax.lax.dot_general(
                    coarse_oh, wf,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                l = j * n_vecs + v
                acc_lo[l * n_coarse:(l + 1) * n_coarse] += p & 0xFFFF
                acc_hi[l * n_coarse:(l + 1) * n_coarse] += p >> 16
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _o():
            nr = n_rows * n_coarse
            out_ref[0:nr] = acc_lo[:]
            out_ref[nr:2 * nr] = acc_hi[:]

    def _fh2(n_limbs, mxu_cov):
        n_bins_pad = ((n_bins + 127) // 128) * 128
        n_coarse = n_bins_pad // FINE

        def run(Mx, wx):
            n_vecs = wx.shape[0]
            n_rows = n_limbs * n_vecs
            return pl.pallas_call(
                functools.partial(
                    _fh2_kernel, n_limbs=n_limbs, mxu_cov=mxu_cov),
                grid=(n_items // B,),
                in_specs=[
                    pl.BlockSpec((n_words, B), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_vecs, B), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(
                    (2 * n_rows * n_coarse, FINE), lambda i: (0, 0),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (2 * n_rows * n_coarse, FINE), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((n_rows * n_coarse, FINE), jnp.int32),
                    pltpu.VMEM((n_rows * n_coarse, FINE), jnp.int32)],
            )(Mx, wx.astype(jnp.int32))
        return run

    def _chain(inner):
        @jax.jit
        def chain(Mx, wx):
            def body(i, a):
                return a + inner(Mx, wx + i).sum()
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return lambda: np.asarray(chain(M, w))

    variants = {
        "read": None,  # special-cased
        "pc": _chain(_simple(_pc_kernel)),
        "pcx": _chain(_simple(_pcx_kernel)),
        "pcm": _chain(_simple(_pcm_kernel)),
        "fh21": _chain(_fh2(1, False)),
        "fhm1": _chain(_fh2(1, True)),
        "fh23": _chain(_fh2(3, False)),
        "fhm3": _chain(_fh2(3, True)),
        "cur1": _chain(lambda Mx, wx: pk.fused_hist_tpu(Mx, wx, n_bins, 1)),
        "cur3": _chain(lambda Mx, wx: pk.fused_hist_tpu(Mx, wx, n_bins, 3)),
    }
    return variants, M, K, read_fn


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    want = sys.argv[2:] or [
        "read", "pc", "pcm", "fh21", "fhm1", "fh23", "fhm3", "cur1", "cur3"
    ]
    variants, M, K, read_fn = _load_probe_funcs()
    sel = {v: variants[v] for v in want}

    # compile everything first
    for name, fn in sel.items():
        t0 = time.perf_counter()
        if name == "read":
            read_fn()
        else:
            fn()
        print(f"compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    results = {v: [] for v in sel}
    for r in range(rounds):
        line = []
        for name, fn in sel.items():
            if name == "read":
                bw = read_fn()
            else:
                t0 = time.perf_counter()
                fn()
                t = time.perf_counter() - t0
                bw = M.nbytes * K / t
            results[name].append(bw / 1e9)
            line.append(f"{name}={bw / 1e9:.0f}")
        print(f"round {r}: " + " ".join(line), flush=True)

    print("\nmedians (GB/s, ratio vs read):")
    med_read = float(np.median(results.get("read", [np.nan])))
    for name in sel:
        med = float(np.median(results[name]))
        print(f"  {name}: {med:.0f} GB/s  ({med / med_read:.3f} of read)",
              flush=True)


if __name__ == "__main__":
    main()
