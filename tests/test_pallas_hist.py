"""Parity tests for the streaming pallas histogram kernel.

`fused_hist_tpu` is the default TPU histogram path (ops/engine.py
_hist_dispatch) and carries the most intricate logic in the repo: the
coarse/fine bin factorization (bin = 32*coarse + fine), the 3x8-bit
weight limb split, and the int32 lo/hi plane recombination. These tests
run the kernel through the pallas interpreter on CPU in CI (and natively
under @pytest.mark.tpu on real hardware) against an independent numpy
oracle, across the boundary cases a recombination off-by-one would hit:
one vs many coarse rows, all three limbs populated, plane sums > 2^16,
and zero/sentinel slots.

Reference histogram semantics: /root/reference/src/graph_broker/
abacus.rs:746-787 (weighted bincount of per-item coverage).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from panacus_tpu.ops import pallas_kernels as pk


def _oracle_hist(M: np.ndarray, w: np.ndarray, n_bins: int) -> np.ndarray:
    """Independent host recomputation: popcount coverage -> weighted
    bincount, exact in int64."""
    cov = np.bitwise_count(M).astype(np.int64).sum(axis=0)
    h = np.bincount(cov, weights=w.astype(np.float64), minlength=n_bins)
    assert h.max(initial=0) < 2**53  # float64-exact range
    return h[:n_bins].astype(np.int64)


def _make_case(rng, n_words, n_items, weight_style):
    """A (M, weights) instance. weight_style picks which limbs carry
    signal and how concentrated the bins are (to force plane overflow)."""
    M = rng.integers(0, 2**32, size=(n_words, n_items), dtype=np.uint32)
    if weight_style == "ones":
        w = np.ones(n_items, dtype=np.int32)
    elif weight_style == "limb0":
        w = rng.integers(0, 256, n_items, dtype=np.int32)
    elif weight_style == "two_limbs":
        # typical bp node-length weights: < 2^16 -> the 2-limb kernel
        w = rng.integers(0, 1 << 16, n_items, dtype=np.int32)
    elif weight_style == "all_limbs":
        # values spanning [0, 2^24): every 8-bit limb is exercised
        w = rng.integers(0, 1 << 24, n_items, dtype=np.int32)
    elif weight_style == "plane_boundary":
        # max-limb weights + concentrated coverage: a single grid step's
        # per-bin partial reaches 16384 * 255 ≈ 4.2M >> 2^16, so both the
        # in-kernel lo/hi int32 planes and the host recombination shift
        # carry real bits.  Concentrate coverage by zeroing most words.
        M[:] = 0
        M[0] = rng.integers(0, 4, n_items, dtype=np.uint32)  # cov in 0..2
        w = np.full(n_items, 0xFFFFFF, dtype=np.int32)
    else:  # pragma: no cover
        raise AssertionError(weight_style)
    # sentinel slot 0 and a padding tail carry zero weight in production
    w[0] = 0
    w[-7:] = 0
    return M, w


CASES = [
    # (n_words, n_items, n_bins, n_vecs, weight_style)
    (1, pk.BLOCK_ITEMS, 34, 1, "ones"),  # one coarse row (n_bins_pad 128)
    (1, pk.BLOCK_ITEMS, 34, 1, "limb0"),
    (2, pk.BLOCK_ITEMS, 66, 2, "all_limbs"),  # two weight vectors, one pass
    (33, 2 * pk.BLOCK_ITEMS, 1026, 1, "all_limbs"),  # many coarse rows
    (33, pk.BLOCK_ITEMS, 1026, 2, "limb0"),
    (3, pk.BLOCK_ITEMS, 98, 2, "two_limbs"),  # 2-limb kernel (bp weights)
    (1, 2 * pk.BLOCK_ITEMS, 34, 1, "plane_boundary"),  # lo/hi plane carry
]


def _run_case(n_words, n_items, n_bins, n_vecs, style, interpret):
    rng = np.random.default_rng(n_words * 1000 + n_bins + n_vecs)
    M_host, _ = _make_case(rng, n_words, n_items, style)
    vecs = []
    expected = []
    for v in range(n_vecs):
        _, w = _make_case(rng, n_words, n_items, style)
        vecs.append(w)
        expected.append(_oracle_hist(M_host, w, n_bins))
    M = jax.device_put(M_host)
    got = pk.hist_pallas_host(M, vecs, n_bins, interpret=interpret)
    assert len(got) == n_vecs
    for v in range(n_vecs):
        np.testing.assert_array_equal(
            np.asarray(got[v]), expected[v],
            err_msg=f"vector {v} of case {style}/{n_bins} bins",
        )


@pytest.mark.parametrize(
    "n_words,n_items,n_bins,n_vecs,style", CASES,
    ids=[f"{c[4]}-w{c[0]}-b{c[2]}-v{c[3]}" for c in CASES],
)
def test_pallas_hist_interpret_parity(n_words, n_items, n_bins, n_vecs, style):
    """Interpret-mode run of the exact kernel (limb split, coarse/fine
    factorization, plane recombination) vs the numpy oracle — runs on CPU
    in CI."""
    _run_case(n_words, n_items, n_bins, n_vecs, style, interpret=True)


@pytest.mark.parametrize("cov_mode", ["csa", "naive", "mxu"])
def test_pallas_hist_coverage_modes(cov_mode, monkeypatch):
    """Both coverage reductions (naive per-word popcount default and the
    Harley-Seal carry-save tree, PANACUS_TPU_COV=csa) produce identical
    histograms; the jit cache is cleared so the env choice retraces."""
    monkeypatch.setenv("PANACUS_TPU_COV", cov_mode)
    pk.fused_hist_tpu.clear_cache()
    try:
        _run_case(33, pk.BLOCK_ITEMS, 1026, 1, "all_limbs", interpret=True)
        _run_case(2, pk.BLOCK_ITEMS, 66, 2, "limb0", interpret=True)
    finally:
        pk.fused_hist_tpu.clear_cache()


def test_pallas_hist_matches_scatter_path():
    """The kernel and the engine's scatter formulation agree on the same
    inputs (the two production dispatch tiers must be interchangeable)."""
    rng = np.random.default_rng(3)
    M_host, w = _make_case(rng, 3, pk.BLOCK_ITEMS, "limb0")
    M = jax.device_put(M_host)
    got = pk.hist_pallas_host(M, [w], 98, interpret=True)[0]
    ref = np.asarray(
        pk.fused_hist_scatter(M, jax.device_put(w), 98)
    ).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.tpu
@pytest.mark.parametrize(
    "n_words,n_items,n_bins,n_vecs,style", CASES,
    ids=[f"{c[4]}-w{c[0]}-b{c[2]}-v{c[3]}" for c in CASES],
)
def test_pallas_hist_tpu_parity(n_words, n_items, n_bins, n_vecs, style):
    """Same cases compiled for real TPU hardware (opt-in: -m tpu on a box
    with a chip; CI forces CPU where this collects but deselects)."""
    if jax.devices()[0].platform not in ("tpu", "axon"):
        pytest.skip("no TPU available")
    _run_case(n_words, n_items, n_bins, n_vecs, style, interpret=False)
