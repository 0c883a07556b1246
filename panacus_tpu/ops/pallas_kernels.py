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


@functools.partial(jax.jit, static_argnums=(2,))
def hist_onehot(cov: jax.Array, weights: jax.Array, n_bins: int) -> jax.Array:
    """XLA formulation of the weighted histogram as a one-hot matmul —
    MXU-friendly on TPU, vectorizes fine on CPU (vs serial scatter)."""
    onehot = (
        cov.reshape(-1, 1)
        == jax.lax.broadcasted_iota(jnp.int32, (cov.shape[0], n_bins), 1)
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        weights.astype(jnp.float32).reshape(1, -1),
        onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]
