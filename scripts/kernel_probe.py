"""Pallas hist-kernel formulation probe (TPU hardware).

Measures one variant per process (the tunnel stalls unpredictably, so a
stall only costs that attempt; the persistent jax compile cache makes
retries cheap once a variant has compiled):

    python scripts/kernel_probe.py pc      # read + popcount only (coverage ceiling)
    python scripts/kernel_probe.py cur3    # production kernel, 3 limbs (roofline shape)
    python scripts/kernel_probe.py cur1    # production kernel, 1 limb (node-hist shape)
    python scripts/kernel_probe.py fh23    # fine-folded weights, 3 limbs
    python scripts/kernel_probe.py fh21    # fine-folded weights, 1 limb
    python scripts/kernel_probe.py parity  # fh2 == production on random input

HISTORICAL NOTE (round 4): chain-wall/K numbers from this script carry
the tunnel's ~26 ms RTT amortized into every pass — the round-3/4
"drifting window" was that artifact (BASELINE.md has the post-mortem).
Only the `read` variant has been converted to RTT-free slope timing;
kernel variants remain single-chain (their RELATIVE ordering is still
meaningful since the bias is a shared constant). The resolved truth:
the production kernel runs at 0.998 of the raw streaming ceiling, so
formulation differences are noise — all variants are memory-bound.
Run each variant under `timeout` and gate on `python bench.py --probe`.
"""
import functools, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from panacus_tpu import runtime
runtime.configure_jax()  # persistent compile cache
import jax, jax.numpy as jnp, numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
from panacus_tpu.ops import pallas_kernels as pk

VARIANTS = (
    "read", "pc", "pcl", "pcm", "cur1", "cur2", "cur3",
    "fh21", "fh22", "fh23", "fhm1", "fhm2", "fhm3",
    "old1", "old2", "old3", "parity", "paritym",
)
if len(sys.argv) != 2 or sys.argv[1] not in VARIANTS:
    sys.exit(f"usage: kernel_probe.py {{{'|'.join(VARIANTS)}}}")
variant = sys.argv[1]
n_words, n_items = 32, 1 << 23
M = jax.random.bits(jax.random.PRNGKey(0), (n_words, n_items), jnp.uint32)
w = jax.random.randint(jax.random.PRNGKey(1), (1, n_items), 0, 1 << 20, dtype=jnp.int32)
n_bins = n_words * 32 + 2
K = 8
B = pk.BLOCK_ITEMS
FINE = pk.FINE

def _pc_kernel(m_ref, w_ref, out_ref, acc):
    # w is only mixed in so the K-pass chain can vary a cheap [1, B]
    # operand per iteration (defeats CSE without re-materializing M —
    # xoring M itself per pass would triple the measured traffic)
    @pl.when(pl.program_id(0) == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    cov = jnp.sum(jax.lax.population_count(m_ref[:]).astype(jnp.int32), axis=0, keepdims=True)
    acc[:] += cov + (w_ref[:] & 1)
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _o(): out_ref[:] = acc[:]

def pc_only(Mx, wx):
    return pl.pallas_call(
        _pc_kernel, grid=(n_items // B,),
        in_specs=[pl.BlockSpec((n_words, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
    )(Mx, wx)

def _pcl_kernel(m_ref, w_ref, out_ref, acc):
    # manually fused accumulate loop (vs jnp.sum's materialize+reduce)
    @pl.when(pl.program_id(0) == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    x = m_ref[:]
    cov = jax.lax.population_count(x[0:1]).astype(jnp.int32)
    for i in range(1, x.shape[0]):
        cov = cov + jax.lax.population_count(x[i:i+1]).astype(jnp.int32)
    acc[:] += cov + (w_ref[:] & 1)
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _o(): out_ref[:] = acc[:]

def pcl_only(Mx, wx):
    return pl.pallas_call(
        _pcl_kernel, grid=(n_items // B,),
        in_specs=[pl.BlockSpec((n_words, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
    )(Mx, wx)

def _pcm_kernel(m_ref, w_ref, out_ref, acc):
    # coverage via MXU: the 31-add VPU reduction over words becomes a
    # bf16 ones-matmul (popcounts are <= 32, exact in bf16); probes
    # whether the VPU add tree is on the popcount pass's critical path
    @pl.when(pl.program_id(0) == 0)
    def _(): acc[:] = jnp.zeros_like(acc)
    pc = (
        jax.lax.population_count(m_ref[:])
        .astype(jnp.int32)
        .astype(jnp.bfloat16)
    )
    ones = jnp.ones((1, pc.shape[0]), jnp.bfloat16)
    cov = jax.lax.dot_general(
        ones, pc, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    acc[:] += cov + (w_ref[:] & 1)
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _o(): out_ref[:] = acc[:]

def pcm_only(Mx, wx):
    return pl.pallas_call(
        _pcm_kernel, grid=(n_items // B,),
        in_specs=[pl.BlockSpec((n_words, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.int32)],
    )(Mx, wx)

def _coarse_kernel(m_ref, w_ref, out_ref, acc_lo, acc_hi, n_limbs=3):
    # the pre-round-3 production formulation (coarse-side weight select,
    # fine one-hot shared): kept as the A/B baseline the fine-folded
    # kernel was measured +4% against (230-231 vs 222 GB/s, ABBA)
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_lo[:] = jnp.zeros_like(acc_lo); acc_hi[:] = jnp.zeros_like(acc_hi)
    cov = jnp.sum(jax.lax.population_count(m_ref[:]).astype(jnp.int32), axis=0, keepdims=True)
    n_vecs = w_ref.shape[0]
    n_rows = n_limbs * n_vecs
    n_coarse = acc_lo.shape[0] // n_rows
    onehot_f = ((cov & (FINE - 1)) == jax.lax.broadcasted_iota(jnp.int32, (FINE, B), 0)).astype(jnp.bfloat16)
    coarse_eq = (cov >> 5) == jax.lax.broadcasted_iota(jnp.int32, (n_coarse, B), 0)
    for v in range(n_vecs):
        wv = w_ref[v:v+1, :]
        for j in range(n_limbs):
            wl = (wv >> (8 * j)) & 0xFF
            wc = jnp.where(coarse_eq, wl, 0).astype(jnp.bfloat16)
            p = jax.lax.dot_general(wc, onehot_f,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            l = j * n_vecs + v
            acc_lo[l*n_coarse:(l+1)*n_coarse] += p & 0xFFFF
            acc_hi[l*n_coarse:(l+1)*n_coarse] += p >> 16
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _o():
        nr = n_rows * n_coarse
        out_ref[0:nr] = acc_lo[:]; out_ref[nr:2*nr] = acc_hi[:]


@functools.partial(jax.jit, static_argnums=(2, 3))
def coarse(Mx, w_vecs, n_bins, n_limbs=3):
    n_bins_pad = ((n_bins + 127) // 128) * 128
    n_vecs = w_vecs.shape[0]
    n_rows = n_limbs * n_vecs
    n_coarse = n_bins_pad // FINE
    return pl.pallas_call(
        functools.partial(_coarse_kernel, n_limbs=n_limbs), grid=(n_items // B,),
        in_specs=[
            pl.BlockSpec((n_words, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_vecs, B), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2*n_rows*n_coarse, FINE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2*n_rows*n_coarse, FINE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_rows*n_coarse, FINE), jnp.int32),
                        pltpu.VMEM((n_rows*n_coarse, FINE), jnp.int32)],
    )(Mx, w_vecs.astype(jnp.int32))


def _fh2_kernel(m_ref, w_ref, out_ref, acc_lo, acc_hi, n_limbs=3):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_lo[:] = jnp.zeros_like(acc_lo); acc_hi[:] = jnp.zeros_like(acc_hi)
    cov = jnp.sum(jax.lax.population_count(m_ref[:]).astype(jnp.int32), axis=0, keepdims=True)
    n_vecs = w_ref.shape[0]
    n_rows = n_limbs * n_vecs
    n_coarse = acc_lo.shape[0] // n_rows
    fine_eq = (cov & (FINE - 1)) == jax.lax.broadcasted_iota(jnp.int32, (FINE, B), 0)
    coarse_oh = ((cov >> 5) == jax.lax.broadcasted_iota(jnp.int32, (n_coarse, B), 0)).astype(jnp.bfloat16)
    for v in range(n_vecs):
        wv = w_ref[v:v+1, :]
        for j in range(n_limbs):
            wl = (wv >> (8 * j)) & 0xFF
            wf = jnp.where(fine_eq, wl, 0).astype(jnp.bfloat16)
            p = jax.lax.dot_general(coarse_oh, wf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            l = j * n_vecs + v
            acc_lo[l*n_coarse:(l+1)*n_coarse] += p & 0xFFFF
            acc_hi[l*n_coarse:(l+1)*n_coarse] += p >> 16
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _o():
        nr = n_rows * n_coarse
        out_ref[0:nr] = acc_lo[:]; out_ref[nr:2*nr] = acc_hi[:]

@functools.partial(jax.jit, static_argnums=(2, 3))
def fh2(Mx, w_vecs, n_bins, n_limbs=3):
    n_bins_pad = ((n_bins + 127) // 128) * 128
    n_vecs = w_vecs.shape[0]
    n_rows = n_limbs * n_vecs
    n_coarse = n_bins_pad // FINE
    return pl.pallas_call(
        functools.partial(_fh2_kernel, n_limbs=n_limbs), grid=(n_items // B,),
        in_specs=[
            pl.BlockSpec((n_words, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_vecs, B), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2*n_rows*n_coarse, FINE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2*n_rows*n_coarse, FINE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_rows*n_coarse, FINE), jnp.int32),
                        pltpu.VMEM((n_rows*n_coarse, FINE), jnp.int32)],
    )(Mx, w_vecs.astype(jnp.int32))

def _fhm_kernel(m_ref, w_ref, out_ref, acc_lo, acc_hi, n_limbs=3):
    # fine-folded weights + MXU coverage reduction (pcm's add tree)
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_lo[:] = jnp.zeros_like(acc_lo); acc_hi[:] = jnp.zeros_like(acc_hi)
    pcnt = (
        jax.lax.population_count(m_ref[:])
        .astype(jnp.int32)
        .astype(jnp.bfloat16)
    )
    ones = jnp.ones((1, pcnt.shape[0]), jnp.bfloat16)
    cov = jax.lax.dot_general(
        ones, pcnt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    n_vecs = w_ref.shape[0]
    n_rows = n_limbs * n_vecs
    n_coarse = acc_lo.shape[0] // n_rows
    fine_eq = (cov & (FINE - 1)) == jax.lax.broadcasted_iota(jnp.int32, (FINE, B), 0)
    coarse_oh = ((cov >> 5) == jax.lax.broadcasted_iota(jnp.int32, (n_coarse, B), 0)).astype(jnp.bfloat16)
    for v in range(n_vecs):
        wv = w_ref[v:v+1, :]
        for j in range(n_limbs):
            wl = (wv >> (8 * j)) & 0xFF
            wf = jnp.where(fine_eq, wl, 0).astype(jnp.bfloat16)
            p = jax.lax.dot_general(coarse_oh, wf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            l = j * n_vecs + v
            acc_lo[l*n_coarse:(l+1)*n_coarse] += p & 0xFFFF
            acc_hi[l*n_coarse:(l+1)*n_coarse] += p >> 16
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _o():
        nr = n_rows * n_coarse
        out_ref[0:nr] = acc_lo[:]; out_ref[nr:2*nr] = acc_hi[:]

@functools.partial(jax.jit, static_argnums=(2, 3))
def fhm(Mx, w_vecs, n_bins, n_limbs=3):
    n_bins_pad = ((n_bins + 127) // 128) * 128
    n_vecs = w_vecs.shape[0]
    n_rows = n_limbs * n_vecs
    n_coarse = n_bins_pad // FINE
    return pl.pallas_call(
        functools.partial(_fhm_kernel, n_limbs=n_limbs), grid=(n_items // B,),
        in_specs=[
            pl.BlockSpec((n_words, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_vecs, B), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2*n_rows*n_coarse, FINE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2*n_rows*n_coarse, FINE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_rows*n_coarse, FINE), jnp.int32),
                        pltpu.VMEM((n_rows*n_coarse, FINE), jnp.int32)],
    )(Mx, w_vecs.astype(jnp.int32))

if variant == 'read':
    import bench

    # bench._xor_read_bw now uses RTT-free slope timing (round 4 fixed a
    # loop-hoist artifact that made every pre-fix read number K*bytes/RTT;
    # see BASELINE.md); None means the slope was unmeasurable
    bw = bench._xor_read_bw(M, K=max(K, 16))
    print(
        f'read: {bw/1e9:.0f} GB/s' if bw else 'read: unmeasurable',
        flush=True,
    )
    sys.exit(0)
elif variant == 'pc':
    @jax.jit
    def chain(M, w):
        def body(i, a): return a + pc_only(M, w + i).sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    c = lambda: chain(M, w)
elif variant == 'pcm':
    @jax.jit
    def chain(M, w):
        def body(i, a): return a + pcm_only(M, w + i).sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    c = lambda: chain(M, w)
elif variant == 'pcl':
    @jax.jit
    def chain(M, w):
        def body(i, a): return a + pcl_only(M, w + i).sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    c = lambda: chain(M, w)
elif variant.startswith('cur'):
    nl = int(variant[-1])
    @jax.jit
    def chain(M, w):
        def body(i, a): return a + pk.fused_hist_tpu(M, w + i, n_bins, nl).sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    c = lambda: chain(M, w)
elif variant.startswith('fh2'):
    nl = int(variant[-1])
    @jax.jit
    def chain(M, w):
        def body(i, a): return a + fh2(M, w + i, n_bins, nl).sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    c = lambda: chain(M, w)
elif variant.startswith('fhm'):
    nl = int(variant[-1])
    @jax.jit
    def chain(M, w):
        def body(i, a): return a + fhm(M, w + i, n_bins, nl).sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    c = lambda: chain(M, w)
elif variant.startswith('old'):
    nl = int(variant[-1])
    @jax.jit
    def chain(M, w):
        def body(i, a): return a + coarse(M, w + i, n_bins, nl).sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    c = lambda: chain(M, w)
elif variant == 'parity':
    a = np.asarray(pk.fused_hist_tpu(M, w, n_bins, 3))
    b = np.asarray(fh2(M, w, n_bins, 3))
    print('parity fh2 vs current:', np.array_equal(a, b), flush=True)
    sys.exit(0)
elif variant == 'paritym':
    a = np.asarray(pk.fused_hist_tpu(M, w, n_bins, 3))
    b = np.asarray(fhm(M, w, n_bins, 3))
    print('parity fhm vs current:', np.array_equal(a, b), flush=True)
    sys.exit(0)

np.asarray(c())
ts = []
for _ in range(3):
    t0 = time.perf_counter(); np.asarray(c()); ts.append(time.perf_counter()-t0)
t = sorted(ts)[1] / K
print(f'{variant}: {M.nbytes/t/1e9:.0f} GB/s ({t*1e3:.2f} ms/pass)', flush=True)
