"""Multi-device shard_map dispatch: results match brute force, and the
compiled programs are COLLECTIVE-FREE — each device scans only its local
item columns and ships a tiny partial; no all-gather/reshard of the item
axis can occur (VERDICT r1 item 3: prove the multi-chip comms shape
instead of asserting it).

Runs on the 8-device virtual CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panacus_tpu.ops import engine as eng

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)

COLLECTIVES = (
    "all-gather",
    "all-reduce",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
)


def _engine_with_pairs(n_items=1000, n_groups=37, seed=0):
    rng = np.random.default_rng(seed)
    e = eng.CountingEngine(n_items, n_groups)
    n_pairs = 6 * n_items
    items = rng.integers(1, n_items + 1, size=n_pairs).astype(np.int64)
    groups = rng.integers(0, n_groups, size=n_pairs).astype(np.int64)
    # host-packed matrix, then adopt (this is the production streamed/classic
    # placement path: sharded over items when >1 device)
    M_host = np.zeros((e.n_words, e.n_items_pad), dtype=np.uint32)
    np.bitwise_or.at(
        M_host, (groups >> 5, items), np.uint32(1) << (groups & 31)
    )
    e.build_from_host_matrix(M_host)
    cov = np.zeros(e.n_items_pad, dtype=np.int64)
    pres = np.zeros((n_groups, e.n_items_pad), dtype=np.int64)
    pres[groups, items] = 1
    cov[:] = pres.sum(axis=0)
    return e, cov, pres


def test_m_is_item_sharded():
    e, _, _ = _engine_with_pairs()
    mesh = eng.item_mesh_of(e.M)
    assert mesh is not None and mesh.devices.size == len(jax.devices())
    assert e.n_items_pad % (eng.ITEM_ALIGN * mesh.devices.size) == 0


def test_sharded_hist_matches_bruteforce():
    e, cov, _ = _engine_with_pairs()
    rng = np.random.default_rng(1)
    w = rng.integers(0, 1000, size=e.n_items + 1).astype(np.int64)
    w[0] = 0
    got = e.hist(w)
    want = np.zeros(e.n_groups + 2, dtype=np.int64)
    np.add.at(want, cov[: e.n_items + 1], w)
    assert np.array_equal(got, want[: e.n_groups + 1])


def test_sharded_similarity_matches_bruteforce():
    e, _, pres = _engine_with_pairs(n_items=700, n_groups=21, seed=3)
    rng = np.random.default_rng(4)
    w = rng.integers(0, 100_000, size=e.n_items + 1).astype(np.int64)
    w[0] = 0
    got = e.similarity(w)
    wp = np.zeros(e.n_items_pad, dtype=np.int64)
    wp[: e.n_items + 1] = w
    want = (pres * wp.reshape(1, -1)) @ pres.T
    assert np.array_equal(got.astype(np.int64), want)


def test_sharded_ordered_growth_matches_single_device():
    e, _, pres = _engine_with_pairs(n_items=500, n_groups=13, seed=5)
    rng = np.random.default_rng(6)
    w = rng.integers(0, 50, size=e.n_items + 1).astype(np.int64)
    w[0] = 0
    got = e.ordered_growth(w, quorum_rel=0.5, c_min=1)
    # reference: unsharded matrix through the single-device blocked scan
    M_plain = jnp.asarray(np.asarray(e.M))
    assert eng.item_mesh_of(M_plain) is None
    wp = np.zeros(e.n_items_pad, dtype=np.int32)
    wp[: e.n_items + 1] = w
    want = eng.ordered_growth(M_plain, wp, 0.5, 1, e.n_groups)
    assert np.array_equal(got, want)


def _compiled_hlo(fn, *args):
    return fn.lower(*args).compile().as_text()


def test_compiled_programs_are_collective_free():
    e, _, _ = _engine_with_pairs(n_items=400, n_groups=9, seed=7)
    mesh = eng.item_mesh_of(e.M)
    n_bins = e.n_groups + 2
    w = jnp.zeros(e.n_items_pad, jnp.int32)
    per = e.n_items_pad // mesh.devices.size

    hlo_hist = _compiled_hlo(eng._sharded_hist_fn(mesh, n_bins), e.M, w)
    thr = jnp.zeros(e.n_groups + 1, jnp.int32)
    hlo_ord = _compiled_hlo(
        eng._sharded_ordered_fn(mesh, 1, max(per // eng.ORDERED_BLOCK, 1)),
        e.M,
        w,
        thr,
    )
    hlo_sim = _compiled_hlo(
        eng._sharded_sim_fn(mesh, max(per // eng.SIM_BLOCK, 1)), e.M, w
    )
    for name, hlo in [
        ("hist", hlo_hist),
        ("ordered", hlo_ord),
        ("sim", hlo_sim),
    ]:
        found = [c for c in COLLECTIVES if c in hlo]
        assert not found, f"{name} program has collectives: {found}"
