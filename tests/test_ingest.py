"""Multi-host ingest invariant: partitioning the path set across hosts and
OR-merging partial membership matrices equals the single-host build."""

import numpy as np

from panacus_tpu.abacus import (
    AbacusByTotal,
    build_membership_host,
    path_order_groups,
)
from panacus_tpu.gfa import GraphStorage
from panacus_tpu.itemize import itemize_paths
from panacus_tpu.mask import GraphMask, GraphMaskParameters
from panacus_tpu.ops import CountingEngine
from panacus_tpu.parallel.ingest import (
    host_path_slice,
    merge_partials,
    partial_membership,
)
from panacus_tpu.utils import CountType

from conftest import reference_file


def _full_M(graph, mask):
    itemized = itemize_paths(graph, mask, [CountType.NODE])
    path_order, groups = path_order_groups(mask, graph.path_segments)
    eng = CountingEngine(graph.node_count, len(groups))
    M = build_membership_host(
        itemized.item_tables[0],
        path_order,
        itemized.exclude_tables[0],
        graph.node_count,
        len(groups),
        eng.n_items_pad,
    )
    return M, eng, groups


def test_partition_merge_equals_full():
    gfa = reference_file("test/chrM_test.gfa")
    g = GraphStorage(gfa, index_edges=False)
    mask = GraphMask.from_datamgr(
        GraphMaskParameters(groupby_sample=True), g
    )
    M_full, eng, groups = _full_M(g, mask)

    for n_hosts in (2, 3):
        partials = []
        for h in range(n_hosts):
            sl = host_path_slice(len(g.path_segments), h, n_hosts)
            Mh, gh = partial_membership(
                g, mask, sl, g.node_count, eng.n_items_pad
            )
            assert gh == groups
            partials.append(Mh)
        merged = merge_partials(partials)
        assert np.array_equal(merged, M_full), f"{n_hosts}-host merge differs"


def test_sliced_hist_matches():
    gfa = reference_file("test/chrM_test.gfa")
    g = GraphStorage(gfa, index_edges=False)
    mask = GraphMask.from_datamgr(
        GraphMaskParameters(groupby_sample=True), g
    )
    M_full, eng, groups = _full_M(g, mask)
    partials = [
        partial_membership(
            g,
            mask,
            host_path_slice(len(g.path_segments), h, 2),
            g.node_count,
            eng.n_items_pad,
        )[0]
        for h in range(2)
    ]
    eng.build_from_host_matrix(merge_partials(partials))
    w = np.ones(g.node_count + 1, dtype=np.int32)
    w[0] = 0
    hist = eng.hist(w)
    assert hist.tolist() == [0, 39, 29, 41, 45]


def test_host_path_slice_partitions():
    for n, k in [(6, 2), (7, 3), (1, 4), (0, 2)]:
        all_idx = np.concatenate(
            [host_path_slice(n, h, k) for h in range(k)]
        )
        assert all_idx.tolist() == list(range(n))
