"""Coverage abaci: device-backed equivalents of AbacusByTotal/AbacusByGroup.

(reference: src/graph_broker/abacus.rs:476-1179)

Both abaci share one representation: the packed membership bit matrix in
device HBM (ops.CountingEngine). AbacusByTotal reads it as a popcount
reduction; AbacusByGroup reads it column-wise (ordered scans, similarity
matmuls, sparse table export).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from .gfa import GraphStorage, ItemTable, PathSegment
from .itemize import ItemizeResult
from .mask import GraphMask
from .ops import CountingEngine
from .utils import ActiveTable, CountType, IntervalContainer, Threshold

log = logging.getLogger("panacus")


def path_order_groups(
    mask: GraphMask, path_segments: List[PathSegment]
) -> Tuple[List[Tuple[int, int]], List[str]]:
    """Resolve (path_idx, group_idx) in processing order plus ordered group
    names (reference: abacus.rs:556-567 group-block walk)."""
    order = mask.get_path_order(path_segments)
    groups: List[str] = []
    out: List[Tuple[int, int]] = []
    for path_id, group_name in order:
        if not groups or groups[-1] != group_name:
            groups.append(group_name)
        out.append((path_id, len(groups) - 1))
    return out, groups


def build_membership_host(
    item_table: ItemTable,
    path_order: List[Tuple[int, int]],
    exclude_table: Optional[ActiveTable],
    n_items: int,
    n_groups: int,
    n_items_pad: int,
) -> np.ndarray:
    """Build the packed membership matrix M[n_words, n_items_pad] host-side:
    one vectorized OR per (path, group) block. Duplicate item visits OR the
    same bit — no dedup pass needed. Excluded items are zeroed afterwards
    (equivalent to the reference's per-visit exclude check,
    abacus.rs:736-737, since an all-zero column counts as coverage 0)."""
    n_words = max((n_groups + 31) // 32, 1)
    M = np.zeros((n_words, n_items_pad), dtype=np.uint32)
    native_done = False
    if path_order and item_table.prefsum is not None:
        from .native import build_membership
        from .runtime import effective_threads

        pids = np.fromiter(
            (p for p, _ in path_order), dtype=np.int64, count=len(path_order)
        )
        gidx = np.fromiter(
            (g for _, g in path_order), dtype=np.int64, count=len(path_order)
        )
        native_done = build_membership(
            item_table.items,
            item_table.prefsum,
            pids,
            gidx,
            M,
            effective_threads(),
        )
    if not native_done:
        for path_id, group_idx in path_order:
            ids = item_table.path_slice(path_id)
            if len(ids) == 0:
                continue
            M[group_idx >> 5, ids] |= np.uint32(1 << (group_idx & 31))
    if exclude_table is not None:
        excluded = np.flatnonzero(exclude_table.items)
        M[:, excluded] = 0
    M[:, 0] = 0  # sentinel slot
    return M


def occurrence_pairs(
    item_table: ItemTable,
    path_order: List[Tuple[int, int]],
    exclude_table: Optional[ActiveTable],
) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate (item, group) occurrence pairs over ordered paths, dropping
    excluded items (reference: coverage loop abacus.rs:719-744)."""
    chunks_i: List[np.ndarray] = []
    chunks_g: List[np.ndarray] = []
    for path_id, group_idx in path_order:
        ids = item_table.path_slice(path_id)
        if len(ids) == 0:
            continue
        chunks_i.append(ids)
        chunks_g.append(np.full(len(ids), group_idx, dtype=np.int32))
    if not chunks_i:
        return np.zeros(0, np.int64), np.zeros(0, np.int32)
    items = np.concatenate(chunks_i)
    groups = np.concatenate(chunks_g)
    if exclude_table is not None:
        keep = ~exclude_table.items[items]
        items, groups = items[keep], groups[keep]
    return items, groups


def quantify_uncovered_bps(
    exclude_table: Optional[ActiveTable],
    subset_covered_bps: Optional[IntervalContainer],
    graph: GraphStorage,
) -> Dict[int, int]:
    """Per-node uncovered bp from partial subset coverage
    (reference: abacus.rs:1187-1229)."""
    res: Dict[int, int] = {}
    if subset_covered_bps is not None:
        for sid in subset_covered_bps.keys():
            if exclude_table is None or not exclude_table.items[sid]:
                l = graph.node_len(sid)
                ex = (
                    exclude_table.get_active_intervals(sid, l)
                    if exclude_table is not None
                    else None
                )
                covered = subset_covered_bps.total_coverage(sid, ex)
                if covered > l:
                    log.error(
                        "oops, total coverage %d is larger than node length %d "
                        "for node %d",
                        covered,
                        l,
                        sid,
                    )
                else:
                    res[sid] = l - covered
    return res


class AbacusByTotal:
    """Coverage histogram per count type, device-backed
    (reference: abacus.rs:476-788)."""

    def __init__(
        self,
        count: CountType,
        engine: CountingEngine,
        groups: List[str],
        uncovered_bps: Dict[int, int],
        graph: GraphStorage,
    ):
        self.count = count
        self.engine = engine
        self.groups = groups
        self.uncovered_bps = uncovered_bps
        self._graph = graph
        self._countable: Optional[np.ndarray] = None

    @classmethod
    def from_itemization(
        cls,
        count: CountType,
        slot: int,
        itemized: ItemizeResult,
        path_order: List[Tuple[int, int]],
        groups: List[str],
        graph: GraphStorage,
    ) -> "AbacusByTotal":
        n_items = graph.number_of_items(count)
        engine = CountingEngine(n_items, len(groups))
        M_host = build_membership_host(
            itemized.item_tables[slot],
            path_order,
            itemized.exclude_tables[slot],
            n_items,
            len(groups),
            engine.n_items_pad,
        )
        engine.build_from_host_matrix(M_host)
        uncovered = quantify_uncovered_bps(
            itemized.exclude_tables[slot],
            itemized.subset_covered_bps if count == CountType.BP else None,
            graph,
        )
        log.info(
            "abacus has %d path groups and %d countables", len(groups), n_items
        )
        return cls(count, engine, groups, uncovered, graph)

    @property
    def countable(self) -> np.ndarray:
        """Per-item coverage; slot 0 is the sentinel (reported as max-u32 to
        mirror reference abacus.rs:551)."""
        if self._countable is None:
            cov = self.engine.coverage().astype(np.int64)
            cov[0] = np.iinfo(np.uint32).max
            self._countable = cov
        return self._countable

    def construct_hist(self) -> np.ndarray:
        log.info("constructing histogram..")
        w = np.ones(self.engine.n_items + 1, dtype=np.int32)
        w[0] = 0
        return self.engine.hist(w)

    def construct_hist_bps(self) -> np.ndarray:
        log.info("constructing bp histogram..")
        w = self._graph.node_lens[: self.engine.n_items + 1].astype(np.int32)
        w = w.copy()
        w[0] = 0
        hist = self.engine.hist(w)
        cov = self.countable
        for sid, uncov in self.uncovered_bps.items():
            hist[cov[sid]] -= uncov
            hist[0] += uncov
        return hist


class AbacusByGroup:
    """Group-resolved coverage built on the same membership matrix
    (reference: abacus.rs:790-1179). Group ids follow the mask's path order;
    ordered growth is a device scan, the table export resolves the sparse
    multiplicity structure host-side."""

    def __init__(
        self,
        count: CountType,
        engine: CountingEngine,
        groups: List[str],
        uncovered_bps: Dict[int, int],
        graph: GraphStorage,
        itemized: ItemizeResult,
        slot: int,
        path_order: List[Tuple[int, int]],
    ):
        self.count = count
        self.engine = engine
        self.groups = groups
        self.uncovered_bps = uncovered_bps
        self._graph = graph
        # kept for lazy multiplicity export (table analysis only)
        self._itemized = itemized
        self._slot = slot
        self._path_order = path_order

    @classmethod
    def from_itemization(
        cls,
        count: CountType,
        slot: int,
        itemized: ItemizeResult,
        path_order: List[Tuple[int, int]],
        groups: List[str],
        graph: GraphStorage,
    ) -> "AbacusByGroup":
        n_items = graph.number_of_items(count)
        engine = CountingEngine(n_items, len(groups))
        M_host = build_membership_host(
            itemized.item_tables[slot],
            path_order,
            itemized.exclude_tables[slot],
            n_items,
            len(groups),
            engine.n_items_pad,
        )
        engine.build_from_host_matrix(M_host)
        uncovered = quantify_uncovered_bps(
            itemized.exclude_tables[slot],
            itemized.subset_covered_bps if count == CountType.BP else None,
            graph,
        )
        log.info(
            "group abacus has %d path groups and %d countables",
            len(groups),
            n_items,
        )
        return cls(
            count, engine, groups, uncovered, graph, itemized, slot, path_order
        )

    def _weights(self) -> np.ndarray:
        """Per-item growth weight: 1 for node/edge, covered bp for bp
        (reference: abacus.rs:1010-1026)."""
        n = self.engine.n_items
        if self.count == CountType.BP:
            w = self._graph.node_lens[: n + 1].astype(np.int64).copy()
            for sid, uncov in self.uncovered_bps.items():
                covered = int(w[sid])
                if uncov > covered:
                    log.error(
                        "oops, #uncovered bps (%d) is larger than #covered bps "
                        "(%d) for node with sid %d",
                        uncov,
                        covered,
                        sid,
                    )
                    w[sid] = 0
                else:
                    w[sid] = covered - uncov
        else:
            w = np.ones(n + 1, dtype=np.int64)
        w[0] = 0
        return w

    def calc_growth(
        self, t_coverage: Threshold, t_quorum: Threshold
    ) -> List[float]:
        """Ordered growth curve (reference: abacus.rs:988-1032)."""
        n_groups = len(self.groups)
        c = max(1, t_coverage.to_absolute(n_groups))
        q = max(0.0, t_quorum.to_relative(n_groups))
        res = self.engine.ordered_growth(self._weights(), q, c)
        return [float(x) for x in res]

    def similarity_matrix(self) -> Tuple[np.ndarray, np.ndarray]:
        """(intersections[G,G], sizes[G]) weighted by node length for bp
        (reference: src/analyses/similarity.rs:119-163)."""
        if self.count == CountType.BP:
            w = self._graph.node_lens[: self.engine.n_items + 1].astype(
                np.float32
            )
        else:
            w = np.ones(self.engine.n_items + 1, dtype=np.float32)
        w[0] = 0.0
        inter = self.engine.similarity(w)
        sizes = np.diagonal(inter).copy()
        return inter, sizes

    def sparse_counts(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(items, group_ids, multiplicities) of the occurrence matrix —
        the CSC (r, c, v) equivalent for table export
        (reference: compute_column_values abacus.rs:901-986)."""
        n_groups = len(self.groups)
        occ_items, occ_groups = occurrence_pairs(
            self._itemized.item_tables[self._slot],
            self._path_order,
            self._itemized.exclude_tables[self._slot],
        )
        if len(occ_items) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        key = occ_items.astype(np.int64) * np.int64(
            n_groups
        ) + occ_groups.astype(np.int64)
        uniq, counts = np.unique(key, return_counts=True)
        return uniq // n_groups, uniq % n_groups, counts

    def to_tsv(self, total: bool, graph: GraphStorage) -> str:
        """Full or total coverage table (reference: abacus.rs:1056-1178)."""
        log.info("reporting coverage table")
        out: List[str] = []
        n_groups = len(self.groups)
        items, group_ids, counts = self.sparse_counts()
        # CSR over items
        n_items = self.engine.n_items
        starts = np.searchsorted(items, np.arange(1, n_items + 2))

        if self.count in (CountType.NODE, CountType.BP):
            head = "node"
            name_of = graph.node_name
        else:
            head = "edge"
            name_of = graph.edge_name
        out.append(head)
        if total:
            out.append("\ttotal")
        else:
            for g in self.groups:
                out.append(f"\t{g}")
        out.append("\n")

        for i in range(1, n_items + 1):
            a, b = starts[i - 1], starts[i]
            if self.count == CountType.BP:
                bp = graph.node_len(i) - self.uncovered_bps.get(i, 0)
            else:
                bp = 1
            out.append(name_of(i))
            if total:
                out.append(f"\t{b - a}\n")
                continue
            # each present group gets its multiplicity (x bp for bp counts);
            # the reference's edge branch (abacus.rs:1164) mis-indexes v by
            # group id — we emit the evidently intended per-slot multiplicity
            row = np.zeros(n_groups, dtype=np.int64)
            row[group_ids[a:b]] = counts[a:b] * bp
            out.append("\t")
            out.append("\t".join(str(x) for x in row))
            out.append("\n")
        return "".join(out)
