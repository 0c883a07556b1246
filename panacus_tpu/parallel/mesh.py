"""Multi-chip scale-out: shard the item (node/edge) axis over a device mesh.

The reference has no distributed substrate at all (rayon threads only,
src/lib.rs:55-67); this module is the TPU-native scaling design:
- the membership matrix M[n_words, n_items] is sharded on its item axis,
- each device scatter-builds its own column slice from host-partitioned
  (item, group) pairs,
- histograms / growth inputs / similarity partials are psum-merged over
  the ICI mesh — outputs are O(n_groups) or O(n_groups^2), tiny.

Works identically on a virtual CPU mesh (tests, dry runs) and real
multi-chip slices.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from ..runtime import configure_jax

configure_jax()

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def item_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("items",))


def shard_pairs(
    items: np.ndarray,
    groups: np.ndarray,
    n_items_pad: int,
    n_shards: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Partition dedup'd (item, group) pairs by item range into per-shard
    fixed-size blocks (padded with no-op zero-bit updates).

    Returns (local_items[n_shards, k], words[n_shards, k], bits[n_shards, k],
    items_per_shard). Pairs must be sorted by item (dedup_pairs output is).
    """
    assert n_items_pad % n_shards == 0
    per = n_items_pad // n_shards
    bounds = np.searchsorted(items, np.arange(1, n_shards + 1) * per)
    starts = np.concatenate([[0], bounds[:-1]])
    k = int(max((bounds - starts).max(), 1) if len(items) else 1)
    li = np.zeros((n_shards, k), dtype=np.int32)
    wd = np.zeros((n_shards, k), dtype=np.int32)
    bt = np.zeros((n_shards, k), dtype=np.uint32)
    for s in range(n_shards):
        a, b = int(starts[s]), int(bounds[s])
        m = b - a
        li[s, :m] = items[a:b] - s * per
        g = groups[a:b]
        wd[s, :m] = g >> 5
        bt[s, :m] = np.uint32(1) << (g & np.int64(31)).astype(np.uint32)
    return li, wd, bt, per


def sharded_hist_pipeline(
    mesh: Mesh,
    n_words: int,
    n_items_pad: int,
    n_bins: int,
):
    """Build a jitted sharded function:
    (local pair blocks, sharded weights, growth weight matrix W) ->
    (hist [n_bins] replicated, growth = W @ hist).

    Each shard: scatter-build its M slice -> popcount coverage -> local
    weighted bincount; hists merge with psum over the item axis; the
    growth matmul runs on the replicated result (tiny, MXU-aligned).
    """
    n_shards = mesh.devices.size
    per = n_items_pad // n_shards

    def per_shard(li, wd, bt, weights_local, W):
        # li/wd/bt: [1, k] local pair block; weights_local: [per]
        M = jnp.zeros((n_words, per), dtype=jnp.uint32)
        M = M.at[wd[0], li[0]].add(bt[0], mode="drop")
        cov = jnp.sum(
            jax.lax.population_count(M).astype(jnp.int32), axis=0,
            dtype=jnp.int32,
        )
        hist_local = jnp.zeros(n_bins, dtype=jnp.int32).at[cov].add(
            weights_local.astype(jnp.int32), mode="drop"
        )
        hist = jax.lax.psum(hist_local, "items")
        growth = W @ hist[: W.shape[1]].astype(W.dtype)
        return hist, growth

    fn = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P("items"), P("items"), P("items"), P("items"), P()),
            out_specs=(P(), P()),
        )
    )
    return fn


def sharded_similarity_pipeline(mesh: Mesh, n_words: int, n_items_pad: int):
    """(local pair blocks, sharded weights) -> [G_pad, G_pad] intersection
    matrix via per-shard MXU matmul + psum."""
    n_shards = mesh.devices.size
    per = n_items_pad // n_shards
    n_groups_pad = n_words * 32

    def per_shard(li, wd, bt, weights_local):
        M = jnp.zeros((n_words, per), dtype=jnp.uint32)
        M = M.at[wd[0], li[0]].add(bt[0], mode="drop")
        shifts = jnp.arange(32, dtype=jnp.uint32).reshape(1, 32, 1)
        Pm = ((M.reshape(n_words, 1, per) >> shifts) & jnp.uint32(1)).reshape(
            n_groups_pad, per
        ).astype(jnp.float32)
        Pw = Pm * weights_local.astype(jnp.float32).reshape(1, -1)
        inter_local = jax.lax.dot_general(
            Pm,
            Pw,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.psum(inter_local, "items")

    return jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P("items"), P("items"), P("items"), P("items")),
            out_specs=P(),
        )
    )
