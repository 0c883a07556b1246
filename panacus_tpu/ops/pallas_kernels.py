"""Pallas TPU kernels for the membership-matrix hot path.

The coverage histogram is the bandwidth-critical op: it reads the whole
packed matrix M (the largest array in the system). The fused kernel
streams M through VMEM once per item block, popcounts the group words,
and accumulates the weighted histogram on-chip via a one-hot MXU matmul —
no [n_items] coverage vector ever round-trips HBM.

Falls back to the XLA one-hot formulation off-TPU (pallas CPU lowering is
interpret-only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLOCK_ITEMS = 2048


def _fused_hist_kernel(m_ref, w_ref, out_ref):
    """One grid step: M block [n_words, B] + weights [1, B] -> accumulate
    the weighted one-hot histogram into out_ref [1, n_bins]."""
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    M = m_ref[:]
    cov = jnp.sum(jax.lax.population_count(M).astype(jnp.int32), axis=0)
    n_bins = out_ref.shape[1]
    onehot = (
        cov.reshape(-1, 1)
        == jax.lax.broadcasted_iota(jnp.int32, (cov.shape[0], n_bins), 1)
    ).astype(jnp.float32)
    w = w_ref[0].astype(jnp.float32)
    partial = jax.lax.dot_general(
        w.reshape(1, -1),
        onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = out_ref[:] + partial


def fused_hist_tpu(M: jax.Array, weights: jax.Array, n_bins: int) -> jax.Array:
    """Weighted coverage histogram via a single streaming pallas pass.

    M: uint32 [n_words, n_items_pad] (n_items_pad % BLOCK_ITEMS == 0)
    weights: int32/float32 [n_items_pad]
    returns float32 [n_bins_pad] (n_bins padded to a lane multiple).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_words, n_items_pad = M.shape
    assert n_items_pad % BLOCK_ITEMS == 0
    n_bins_pad = ((n_bins + 127) // 128) * 128
    grid = (n_items_pad // BLOCK_ITEMS,)
    out = pl.pallas_call(
        _fused_hist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n_words, BLOCK_ITEMS),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BLOCK_ITEMS), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_bins_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_bins_pad), jnp.float32),
    )(M, weights.reshape(1, -1))
    return out[0]


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
