"""Pallas TPU kernels for the membership-matrix hot path.

The coverage histogram is the bandwidth-critical op: it reads the whole
packed matrix M (the largest array in the system). XLA's formulations pay
for it dearly: the plain one-hot matmul materializes an [n_items, n_bins]
operand to HBM (tens of GB of traffic at roofline scale — measured
20 GB/s effective on a 1 GiB matrix), and scatter-adds serialize.

`fused_hist_tpu` streams M through VMEM once: popcount coverage on the
VPU, then the histogram as a *factorized* one-hot matmul that never
leaves VMEM. The bin index is split as bin = 32*coarse + fine, so per
item only (n_bins/32 + 32) one-hot lanes are materialized instead of
n_bins — hist2d[c, f] = (w * onehot_coarse) @ onehot_fine^T — which
keeps the VPU compare/select work ~20x below the naive one-hot at 1k
bins. Measured on TPU v5e with RTT-free slope timing (1 GiB M, 1026
bins, bench.py round 4): **631 GB/s = 0.77 of the 819 GB/s HBM
nameplate = 0.998 of the same-connection raw xor-read streaming
ceiling (632 GB/s)** — the full weighted histogram is completely hidden
behind the memory stream. (Earlier rounds reported ~325 GB/s: a timing
artifact — the tunnel's ~26 ms dispatch round trip amortized into
single-chain wall clocks; see BASELINE.md.) The XLA one-hot formulation
measures 82 GB/s on the same shape.

Weights arrive as int32 vectors (one per histogram, e.g. node + bp
sharing one pass over M); the kernel splits each into three 8-bit limb
rows and accumulates partials exactly in two int32 planes (low/high 16
bits), recombined on the host. Keeping the limb split in-kernel keeps
the host->device weight transfer at 4 bytes/item/histogram.

Falls back to the XLA formulations off-TPU (pallas CPU lowering is
interpret-only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

BLOCK_ITEMS = 16384  # items per grid step (== ops.engine.ITEM_ALIGN)
MAX_BINS_PAD = 2304  # VMEM budget for the [n_coarse, BLOCK_ITEMS] planes


FINE = 32  # fine-level one-hot width (bin = 32 * coarse + fine)


def _csa(a, b, c):
    """Carry-save full adder on bit-planes: (sum, carry)."""
    u = a ^ b
    return u ^ c, (a & b) | (u & c)


def _coverage_reduce(x):
    """Column popcount-sum of [n_words, B] uint32 -> int32 [1, B].

    Default: per-word popcount + add tree — measured FASTER than the
    Harley-Seal carry-save alternative below on TPU v5e (299 vs 259 GB/s
    end-to-end in the same session; the VPU lowers population_count
    cheaply, so trading popcounts for ~5 bitwise ops/word loses).
    PANACUS_TPU_COV=csa selects the carry-save tree, =mxu replaces the
    VPU add tree with a bf16 ones-matmul on the MXU (popcounts <= 32 are
    bf16-exact) — on fast tunnel connections the kernel is VPU-issue
    bound at ~2 ops/word (popcount + add), so shedding the add can raise
    the ceiling; see BASELINE.md round-4 decomposition. All paths are
    interpret-tested against a numpy oracle in tests/test_pallas_hist.py;
    the choice is read at trace time."""
    mode = os.environ.get("PANACUS_TPU_COV", "naive")
    if mode == "mxu" and x.shape[0] > 1:
        pcv = (
            jax.lax.population_count(x)
            .astype(jnp.int32)
            .astype(jnp.bfloat16)
        )
        ones = jnp.ones((1, x.shape[0]), jnp.bfloat16)
        return jax.lax.dot_general(
            ones,
            pcv,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
    if mode != "csa":
        return jnp.sum(
            jax.lax.population_count(x).astype(jnp.int32),
            axis=0,
            keepdims=True,
        )
    n_words = x.shape[0]
    pc = jax.lax.population_count

    def w(i):
        return x[i : i + 1]

    zero = jnp.zeros_like(x[0:1])
    ones = twos = fours = eights = zero
    total = jnp.zeros((1, x.shape[1]), jnp.int32)
    i = 0
    while i + 16 <= n_words:
        ones, twosA = _csa(ones, w(i), w(i + 1))
        ones, twosB = _csa(ones, w(i + 2), w(i + 3))
        twos, foursA = _csa(twos, twosA, twosB)
        ones, twosA = _csa(ones, w(i + 4), w(i + 5))
        ones, twosB = _csa(ones, w(i + 6), w(i + 7))
        twos, foursB = _csa(twos, twosA, twosB)
        fours, eightsA = _csa(fours, foursA, foursB)
        ones, twosA = _csa(ones, w(i + 8), w(i + 9))
        ones, twosB = _csa(ones, w(i + 10), w(i + 11))
        twos, foursA = _csa(twos, twosA, twosB)
        ones, twosA = _csa(ones, w(i + 12), w(i + 13))
        ones, twosB = _csa(ones, w(i + 14), w(i + 15))
        twos, foursB = _csa(twos, twosA, twosB)
        fours, eightsB = _csa(fours, foursA, foursB)
        eights, sixteens = _csa(eights, eightsA, eightsB)
        total += pc(sixteens).astype(jnp.int32) << 4
        i += 16
    for j in range(i, n_words):
        total += pc(w(j)).astype(jnp.int32)
    total += (
        pc(ones).astype(jnp.int32)
        + (pc(twos).astype(jnp.int32) << 1)
        + (pc(fours).astype(jnp.int32) << 2)
        + (pc(eights).astype(jnp.int32) << 3)
    )
    return total


def _fused_hist_kernel(m_ref, w_ref, out_ref, acc_lo, acc_hi, n_limbs=3):
    """One grid step: M block [n_words, B] uint32 + int32 weight vectors
    [n_vecs, B] -> accumulate per-limb histograms into two int32 planes.

    n_limbs is sized from the caller's actual weight range (1 for
    all-ones node hists, 2 for typical bp node-length weights, 3 for the
    full 24-bit range): the per-limb coarse select + bf16 cast is the
    kernel's dominant VPU cost, so shedding unused limbs buys real
    bandwidth.

    Layout: items ride the 128-lane (minor) dimension everywhere — the
    one-hot planes are [FINE, B] and [n_coarse, B], so no tiny minor dim
    gets padded up to a full lane tile (the [B, n_coarse] layout OOM'd
    VMEM exactly that way). The accumulators are [n_rows * n_coarse,
    FINE] (limb row l, coarse bin c at acc[l*n_coarse + c, f] =
    hist_l[32c + f]); the host flattens each [n_coarse, FINE] plane
    row-major, which is exactly bin order. Exactness: each matmul sums B
    terms of <= 255 in f32 (B * 255 < 2^24, exact); the int32 lo/hi
    split keeps plane accumulation exact to ~half a billion items.
    """
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_lo[:] = jnp.zeros_like(acc_lo)
        acc_hi[:] = jnp.zeros_like(acc_hi)

    cov = _coverage_reduce(m_ref[:])  # [1, B]
    n_vecs = w_ref.shape[0]
    n_rows = n_limbs * n_vecs
    n_coarse = acc_lo.shape[0] // n_rows
    B = cov.shape[1]
    # fine-folded formulation: the per-limb weight select rides the
    # 32-lane FINE plane and the (wider) coarse one-hot is computed ONCE
    # and shared across limbs — (n_limbs-1) * n_coarse fewer VPU lanes
    # per item than selecting weights on the coarse side. Measured +4%
    # end-to-end at 3 limbs on v5e (231 vs 222 GB/s, ABBA-reproducible),
    # which puts the full kernel at 97% of its popcount-only ceiling.
    fine_eq = (cov & (FINE - 1)) == jax.lax.broadcasted_iota(
        jnp.int32, (FINE, B), 0
    )  # [FINE, B] bool
    coarse_oh = (
        (cov >> 5)
        == jax.lax.broadcasted_iota(jnp.int32, (n_coarse, B), 0)
    ).astype(jnp.bfloat16)  # [n_coarse, B]
    for v in range(n_vecs):
        wv = w_ref[v : v + 1, :]  # [1, B] int32
        for j in range(n_limbs):
            # 8-bit limb (<= 255: bf16-exact), spread over fine rows
            wl = (wv >> (8 * j)) & 0xFF
            wf = jnp.where(fine_eq, wl, 0).astype(
                jnp.bfloat16
            )  # [FINE, B]
            p = jax.lax.dot_general(
                coarse_oh,
                wf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)  # [n_coarse, FINE]
            l = j * n_vecs + v
            acc_lo[l * n_coarse : (l + 1) * n_coarse] += p & 0xFFFF
            acc_hi[l * n_coarse : (l + 1) * n_coarse] += p >> 16

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _out():
        nr = n_rows * n_coarse
        out_ref[0:nr] = acc_lo[:]
        out_ref[nr : 2 * nr] = acc_hi[:]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def fused_hist_tpu(
    M: jax.Array,
    w_vecs: jax.Array,
    n_bins: int,
    n_limbs: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """Multi-histogram streaming pallas pass (jitted; retrace only per
    (shape, n_bins)).

    M: uint32 [n_words, n_items_pad] (n_items_pad % BLOCK_ITEMS == 0)
    w_vecs: int32 [n_vecs, n_items_pad], weights in [0, 2^24)
    returns int32 [2 * 3 * n_vecs * n_coarse, FINE]: the first
    3*n_vecs*n_coarse rows are the low 16 bits of each limb histogram
    (limb j of vector v occupies rows (j*n_vecs+v)*n_coarse onward, one
    row per coarse bin), the rest the high bits; the host flattens
    [n_coarse, FINE] row-major into bin order and recombines.

    interpret=True runs the kernel through the pallas interpreter (works
    on CPU) — the CI parity tests exercise the exact limb/plane logic
    without TPU hardware (tests/test_pallas_hist.py).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_words, n_items_pad = M.shape
    n_vecs = w_vecs.shape[0]
    assert n_items_pad % BLOCK_ITEMS == 0
    assert w_vecs.shape == (n_vecs, n_items_pad)
    n_bins_pad = ((n_bins + 127) // 128) * 128
    assert n_bins_pad <= MAX_BINS_PAD
    assert 1 <= n_limbs <= 3
    n_rows = n_limbs * n_vecs
    n_coarse = n_bins_pad // FINE
    grid = (n_items_pad // BLOCK_ITEMS,)
    return pl.pallas_call(
        functools.partial(_fused_hist_kernel, n_limbs=n_limbs),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_words, BLOCK_ITEMS),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_vecs, BLOCK_ITEMS),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2 * n_rows * n_coarse, FINE),
            lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (2 * n_rows * n_coarse, FINE), jnp.int32
        ),
        scratch_shapes=[
            pltpu.VMEM((n_rows * n_coarse, FINE), jnp.int32),
            pltpu.VMEM((n_rows * n_coarse, FINE), jnp.int32),
        ],
        interpret=interpret,
    )(M, w_vecs.astype(jnp.int32))


def _limbs_for(w_max: int) -> int:
    if w_max < (1 << 8):
        return 1
    if w_max < (1 << 16):
        return 2
    return 3


def hist_pallas_host(
    M, weight_vectors, n_bins: int, interpret: bool = False, n_limbs=None
):
    """Driver for fused_hist_tpu: stack the int weight vectors (< 2^24,
    caller-guaranteed; each a host array padded to n_items or a device
    array already next to M, e.g. the engine's device-built ones), run the
    streaming kernel once for all of them, recombine the limb planes
    exactly in int64 on the host. Returns a list of int64 [n_bins]
    histograms, one per input vector."""
    import numpy as np

    n_vecs = len(weight_vectors)
    n_items = M.shape[1]
    dev = next(iter(M.devices()))
    vecs = []
    infer = n_limbs is None
    if infer:
        n_limbs = 1
    for wv in weight_vectors:
        if isinstance(wv, jax.Array):
            # device-resident vector: its range is unknown host-side, so
            # the caller must state the limb count explicitly (the engine
            # does — it knows w_max); inferring defaults to the safe 3
            if infer:
                n_limbs = 3
            vecs.append(wv.astype(jnp.int32))
            continue
        wi = np.zeros(n_items, dtype=np.int32)
        wi[: len(wv)] = wv
        if infer:
            n_limbs = max(n_limbs, _limbs_for(int(wi.max(initial=0))))
        vecs.append(jax.device_put(wi, dev))
    w = jnp.stack(vecs) if n_vecs > 1 else vecs[0].reshape(1, -1)
    out = np.asarray(
        fused_hist_tpu(M, w, n_bins, n_limbs, interpret)
    ).astype(np.int64)
    n_rows = n_limbs * n_vecs
    nr = out.shape[0] // 2
    # [n_rows*n_coarse, FINE] -> [n_rows, n_bins_pad] (row-major flatten
    # of the [n_coarse, FINE] planes IS bin order: bin = 32*coarse + fine)
    lo = out[0:nr].reshape(n_rows, -1)
    hi = out[nr : 2 * nr].reshape(n_rows, -1)
    hists = []
    for v in range(n_vecs):
        h = np.zeros(lo.shape[1], dtype=np.int64)
        for j in range(n_limbs):
            r = j * n_vecs + v
            h += (lo[r] + (hi[r] << 16)) << (8 * j)
        hists.append(h[:n_bins])
    return hists


# -- fused single-dispatch histograms -----------------------------------------
#
# On the tunneled TPU backend every dispatch pays a network round trip, so
# popcount-coverage and the histogram reduction are fused into one program.


def _coverage(M):
    return jnp.sum(
        jax.lax.population_count(M).astype(jnp.int32), axis=0, dtype=jnp.int32
    )


@functools.partial(jax.jit, static_argnums=(2,))
def fused_hist_scatter(M, w, n_bins: int):
    """int32 scatter histogram, exact below 2^31 total weight — the fast CPU
    path (XLA:CPU lowers the one-hot matmul poorly, ~60x slower than its
    serial scatter). Callers with larger totals use the limb path or a host
    bincount."""
    cov = _coverage(M)
    return jnp.zeros(n_bins, dtype=jnp.int32).at[cov].add(
        w.astype(jnp.int32), mode="drop"
    )


@functools.partial(jax.jit, static_argnums=(2,))
def fused_hist_onehot(M, w, n_bins: int):
    """f32 one-hot matmul histogram — MXU path, exact while the total weight
    stays below 2^24 (f32 integer range)."""
    cov = _coverage(M)
    onehot = (
        cov.reshape(-1, 1)
        == jax.lax.broadcasted_iota(jnp.int32, (cov.shape[0], n_bins), 1)
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        w.astype(jnp.float32).reshape(1, -1),
        onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]


HIST_LIMB_BLOCK = 1 << 13


@functools.partial(jax.jit, static_argnums=(2,))
def fused_hist_limbs(M, w3, n_bins: int):
    """Exact one-hot histogram for weights up to 2^24: weights are split into
    three 8-bit limbs host-side (w3[3, n_items]), items are processed in
    blocks of 2^13 so every f32 dot accumulation stays below 2^13 * 255 <
    2^24 (exact). Returns per-block limb partials [n_blocks, 3, n_bins] —
    recombined on the host in int64."""
    n_words, n_items = M.shape
    n_blocks = n_items // HIST_LIMB_BLOCK
    Mb = M.reshape(n_words, n_blocks, HIST_LIMB_BLOCK).transpose(1, 0, 2)
    Wb = w3.reshape(3, n_blocks, HIST_LIMB_BLOCK).transpose(1, 0, 2)

    def body(args):
        mb, wb = args
        cov = _coverage(mb)
        onehot = (
            cov.reshape(-1, 1)
            == jax.lax.broadcasted_iota(
                jnp.int32, (HIST_LIMB_BLOCK, n_bins), 1
            )
        ).astype(jnp.float32)
        return jax.lax.dot_general(
            wb,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return jax.lax.map(body, (Mb, Wb))


def hist_limbs_host(M, w: "jax.Array", n_bins: int):
    """Driver for fused_hist_limbs: split uint32 weights into 8-bit limbs,
    run the single-dispatch blocked kernel, recombine exactly in int64."""
    import numpy as np

    wi = np.asarray(w).astype(np.int64)
    w3 = np.empty((3, len(wi)), dtype=np.float32)
    w3[0] = (wi & 0xFF).astype(np.float32)
    w3[1] = ((wi >> 8) & 0xFF).astype(np.float32)
    w3[2] = ((wi >> 16) & 0xFF).astype(np.float32)
    parts = np.asarray(fused_hist_limbs(M, jnp.asarray(w3), n_bins))
    acc = parts.astype(np.int64).sum(axis=0)  # [3, n_bins]
    return acc[0] + (acc[1] << 8) + (acc[2] << 16)
