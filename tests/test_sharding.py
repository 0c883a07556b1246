"""Multi-device sharding: the psum-merged pipelines must match the
single-device engine bit-for-bit on a virtual 8-device CPU mesh."""

import numpy as np

import jax

from panacus_tpu.ops.engine import (
    CountingEngine,
    dedup_pairs,
)
from panacus_tpu.ops.growth_device import growth_weight_matrix
from panacus_tpu.parallel.mesh import (
    item_mesh,
    shard_pairs,
    sharded_hist_pipeline,
    sharded_similarity_pipeline,
)
from panacus_tpu.utils import Threshold


def make_instance(n_items=1000, n_groups=17, n_occ=20000, seed=3):
    rng = np.random.default_rng(seed)
    occ_items = rng.integers(1, n_items + 1, size=n_occ)
    occ_groups = rng.integers(0, n_groups, size=n_occ)
    return occ_items, occ_groups


def test_sharded_hist_matches_single_device():
    n_items, n_groups = 1000, 17
    occ_items, occ_groups = make_instance(n_items, n_groups)
    engine = CountingEngine(n_items, n_groups)
    engine.build(occ_items, occ_groups)
    w = np.ones(n_items + 1, dtype=np.int32)
    w[0] = 0
    single = engine.hist(w)

    n_dev = 8
    mesh = item_mesh(n_dev)
    n_items_pad = engine.n_items_pad
    items, groups = dedup_pairs(occ_items, occ_groups, n_groups)
    li, wd, bt, per = shard_pairs(items, groups, n_items_pad, n_dev)
    weights = np.zeros(n_items_pad, dtype=np.int32)
    weights[1 : n_items + 1] = 1
    W = growth_weight_matrix(
        n_groups, Threshold.absolute(1), Threshold.rel(0.0)
    ).astype(np.float32)
    fn = sharded_hist_pipeline(mesh, engine.n_words, n_items_pad, n_groups + 2)
    hist, growth = fn(li, wd, bt, weights, W)
    assert np.asarray(hist)[: n_groups + 1].tolist() == single.tolist()
    # growth at m=n must equal the union size (= items with coverage >= 1)
    assert abs(float(growth[-1]) - float(single[1:].sum())) < 1e-3


def test_sharded_similarity_matches_single_device():
    n_items, n_groups = 700, 9
    occ_items, occ_groups = make_instance(n_items, n_groups, seed=11)
    engine = CountingEngine(n_items, n_groups)
    engine.build(occ_items, occ_groups)
    w = np.ones(n_items + 1, dtype=np.float32)
    w[0] = 0.0
    single = engine.similarity(w)

    n_dev = 8
    mesh = item_mesh(n_dev)
    items, groups = dedup_pairs(occ_items, occ_groups, n_groups)
    li, wd, bt, per = shard_pairs(items, groups, engine.n_items_pad, n_dev)
    weights = np.zeros(engine.n_items_pad, dtype=np.float32)
    weights[1 : n_items + 1] = 1.0
    fn = sharded_similarity_pipeline(mesh, engine.n_words, engine.n_items_pad)
    inter = np.asarray(fn(li, wd, bt, weights))
    assert np.allclose(inter[:n_groups, :n_groups], single)


def test_growth_device_matmul_matches_exact():
    """Device growth-matmul path vs the recurrence-exact host path."""
    from panacus_tpu.hist import Hist
    from panacus_tpu.utils import CountType

    rng = np.random.default_rng(5)
    n = 20
    hist = np.zeros(n + 1, dtype=np.int64)
    hist[1:] = rng.integers(0, 100, n)
    h = Hist(CountType.NODE, hist.tolist())
    for cov, q in [
        (Threshold.absolute(1), Threshold.rel(0.0)),
        (Threshold.absolute(2), Threshold.rel(0.0)),
        (Threshold.absolute(1), Threshold.rel(1.0)),
        (Threshold.absolute(1), Threshold.rel(0.6)),
        (Threshold.absolute(3), Threshold.rel(0.35)),
    ]:
        exact = np.array(h.calc_growth(cov, q))
        W = growth_weight_matrix(n, cov, q)
        matmul = W @ hist.astype(np.float64)
        assert np.allclose(matmul, exact, atol=1e-7, rtol=1e-9), (cov, q)
