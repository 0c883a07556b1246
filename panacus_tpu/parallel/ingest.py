"""Multi-host ingest: partition the path set across hosts, tokenize only
the local slice, and merge partial membership matrices.

The reference is strictly single-process (rayon threads only,
src/lib.rs:55-67); this is the TPU-native scale-out design from the ground
up: P/W lines are independent given the node table, and the membership
build is a commutative OR, so any partition of the path set produces the
same matrix. Each host:

  1. indexes the GFA structure (S lines + path spans — a cheap scan
     relative to tokenizing the path payload, which is 70-95% of the
     bytes),
  2. tokenizes ONLY its slice of the paths (`host_path_slice`),
  3. builds a partial membership matrix and ORs it into its device shards
     (`jax.make_array_from_single_device_arrays` across processes, or a
     psum of partials on a virtual mesh).

`init_distributed()` wires `jax.distributed.initialize` for real
multi-host slices; tests exercise the partition/merge invariant on a
single process (tests/test_ingest.py).
"""

from __future__ import annotations

import logging
import os
from typing import List, Tuple

import numpy as np

from ..gfa import GraphStorage
from ..mask import GraphMask

log = logging.getLogger("panacus")


def init_distributed() -> bool:
    """Initialize the JAX distributed runtime when multi-host env vars are
    present (JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID,
    or a managed TPU pod environment). Returns True when running
    multi-host."""
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        log.info(
            "distributed runtime: process %d/%s", jax.process_index(), nproc
        )
        return True
    try:
        if jax.process_count() > 1:
            return True
    except Exception:
        pass
    return False


def host_path_slice(n_paths: int, host_id: int, n_hosts: int) -> np.ndarray:
    """Contiguous, balanced partition of path indices across hosts."""
    bounds = np.linspace(0, n_paths, n_hosts + 1).astype(np.int64)
    return np.arange(bounds[host_id], bounds[host_id + 1], dtype=np.int64)


def partial_membership(
    graph: GraphStorage,
    mask: GraphMask,
    path_indices: np.ndarray,
    n_items: int,
    n_items_pad: int,
) -> Tuple[np.ndarray, List[str]]:
    """One host's contribution to the packed membership matrix: OR of the
    group bits of every path in `path_indices` (no masks — masked runs use
    the full itemizer). Returns (M_partial, ordered group names).

    The global group-index mapping comes from the mask's full path order,
    so every host assigns identical columns; the merge is a plain
    bitwise-OR (or a device psum of disjoint bits)."""
    from ..abacus import path_order_groups

    path_order, groups = path_order_groups(mask, graph.path_segments)
    group_of = {p: g for p, g in path_order}
    n_groups = len(groups)
    n_words = max((n_groups + 31) // 32, 1)
    M = np.zeros((n_words, n_items_pad), dtype=np.uint32)

    sel = np.asarray(
        [p for p in path_indices if p in group_of], dtype=np.int64
    )
    batch = graph.all_path_item_runs(sel)
    if batch is not None:
        ids, _orient, prefsum, _bp = batch
        for k, p in enumerate(sel):
            g = group_of[int(p)]
            run = ids[prefsum[k] : prefsum[k + 1]]
            M[g >> 5, run] |= np.uint32(1 << (g & 31))
    else:
        for p in sel:
            g = group_of[int(p)]
            run, _ = graph.path_item_run(int(p))
            M[g >> 5, run] |= np.uint32(1 << (g & 31))
    M[:, 0] = 0
    M[:, n_items + 1 :] = 0
    return M, groups


def merge_partials(partials: List[np.ndarray]) -> np.ndarray:
    """OR-merge host partials (single-process form of the cross-host
    reduction; on device shards this is a psum — disjoint bits make
    add == or only per (item, group), so the merge must stay bitwise-OR
    across hosts that may share paths' groups)."""
    out = partials[0].copy()
    for p in partials[1:]:
        np.bitwise_or(out, p, out=out)
    return out
