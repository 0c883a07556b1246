"""Histogram -> pangenome growth math core.

Exact expected-growth formulas in the log2 domain, replicating the
reference's incremental accumulation (reference: src/graph_broker/hist.rs:
21-187) but vectorized over the coverage axis with numpy float64. The
per-m recurrences are preserved exactly, so results agree with the
reference to <= 1e-10 (and bit-identically after the writer's floor()).

The recurrence-exact host path is the parity-bearing default (growth
tables are O(n_groups^2) — microseconds next to counting at typical
group counts). Above ops.growth_device.GROWTH_MATMUL_MIN_N groups,
union/core growths auto-route through the closed-form weight-matrix
product (same math, fully vectorized; ~1e-9 relative agreement, which
the writer's floor() absorbs).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import List

import numpy as np

from .utils import CountType, Threshold, ThresholdContainer

log = logging.getLogger("panacus")


def _matmul_threshold() -> int:
    from .ops.growth_device import matmul_threshold

    return matmul_threshold() or (1 << 62)


def choose_log2(n: int, k: int) -> float:
    """log2 of C(n, k) via the same incremental sum as the reference
    (hist.rs:21-36)."""
    if k > n:
        return 0.0
    if k > n - k:
        k = n - k
    res = 0.0
    nf = float(n)
    for i in range(k):
        res += np.log2(nf - i)
        res -= np.log2(i + 1.0)
    return res


def _choose_log2_table(n: int) -> np.ndarray:
    """log2 C(i, j) for 0 <= j <= i <= n, with the reference's conventions:
    entry is 0.0 when j == 0, j == i, or j > i."""
    tab = np.zeros((n + 1, n + 1), dtype=np.float64)
    for i in range(n + 1):
        if i < 2:
            continue
        half = i // 2
        t = np.arange(half, dtype=np.float64)
        terms = np.log2(i - t) - np.log2(t + 1.0)
        cs = np.cumsum(terms)
        for j in range(1, i):
            k = j if j <= i - j else i - j
            tab[i, j] = cs[k - 1]
    return tab


@dataclass
class Hist:
    """(reference: src/graph_broker/hist.rs:15-19)"""

    count: CountType
    coverage: List[int]

    def calc_growth(
        self, t_coverage: Threshold, t_quorum: Threshold
    ) -> List[float]:
        n = len(self.coverage) - 1
        if n <= 0:
            return []
        if n >= _matmul_threshold():
            # large group counts: closed-form weight-matrix product
            # (ops/growth_device.py) instead of the per-m Python
            # recurrence loop; returns None for general quorums, which
            # keep the memoized recurrence below
            from .ops.growth_device import growth_matmul

            g = growth_matmul(
                np.asarray(self.coverage, dtype=np.float64),
                t_coverage,
                t_quorum,
            )
            if g is not None:
                return g.tolist()
        quorum = max(1, t_quorum.to_absolute(n))
        if quorum == 1:
            return self.calc_growth_union(t_coverage)
        if quorum >= n:
            return self.calc_growth_core(t_coverage)
        return self.calc_growth_quorum(t_coverage, t_quorum)

    def calc_all_growths(self, hist_aux: ThresholdContainer) -> List[List[float]]:
        growths = []
        for c, q in zip(hist_aux.coverage, hist_aux.quorum):
            log.info(
                "calculating growth for coverage >= %s and quorum >= %s", c, q
            )
            g = self.calc_growth(c, q)
            growths.append([float("nan")] + g)
        return growths

    def calc_growth_union(self, t_coverage: Threshold) -> List[float]:
        """(reference: hist.rs:89-114)"""
        hist = np.asarray(self.coverage, dtype=np.float64)
        n = len(hist) - 1
        c = max(1, t_coverage.to_absolute(n))
        tot = float(np.sum(self.coverage[c:]))
        pangrowth = np.zeros(n, dtype=np.float64)
        perc_mult = np.zeros(n + 1, dtype=np.float64)
        n_fall_m = 0.0
        with np.errstate(divide="ignore"):
            log_hist = np.log2(hist)
        idx = np.arange(n + 1, dtype=np.float64)
        for m in range(1, n + 1):
            n_fall_m += np.log2(n - m + 1.0)
            lo, hi = c, n - m + 1  # i in [c, n-m]
            if lo < hi:
                perc_mult[lo:hi] += np.log2(n - m - idx[lo:hi] + 1.0)
                y = float(
                    np.sum(np.exp2(log_hist[lo:hi] + perc_mult[lo:hi] - n_fall_m))
                )
            else:
                y = 0.0
            pangrowth[m - 1] = tot - y
        return pangrowth.tolist()

    def calc_growth_core(self, t_coverage: Threshold) -> List[float]:
        """(reference: hist.rs:116-138; note to_absolute(n+1) quirk at :118)"""
        hist = np.asarray(self.coverage, dtype=np.float64)
        n = len(hist) - 1
        c = max(1, t_coverage.to_absolute(n + 1))
        pangrowth = np.zeros(n, dtype=np.float64)
        perc_mult = np.zeros(n + 1, dtype=np.float64)
        n_fall_m = 0.0
        with np.errstate(divide="ignore"):
            log_hist = np.log2(hist)
        idx = np.arange(n + 1, dtype=np.float64)
        for m in range(1, n + 1):
            n_fall_m += np.log2(n - m + 1.0)
            lo = max(m, c)
            perc_mult[lo:] += np.log2(idx[lo:] - m + 1.0)
            pangrowth[m - 1] = float(
                np.sum(np.exp2(log_hist[lo:] + perc_mult[lo:] - n_fall_m))
            )
        return pangrowth.tolist()

    def calc_growth_quorum(
        self, t_coverage: Threshold, t_quorum: Threshold
    ) -> List[float]:
        """General quorum case with the memoized q[i][j] recurrence
        (reference: hist.rs:140-187), vectorized over the (i, j) grid."""
        hist = np.asarray(self.coverage, dtype=np.float64)
        n = len(hist) - 1
        c = max(1, t_coverage.to_absolute(n))
        quorum = t_quorum.to_relative(n)
        pangrowth = np.zeros(n, dtype=np.float64)

        n_fall_m = 0.0
        m_fact = 0.0
        perc_mult = np.zeros(n + 1, dtype=np.float64)
        q = np.zeros((n + 1, n + 1), dtype=np.float64)
        choose_tab = _choose_log2_table(n)
        with np.errstate(divide="ignore"):
            log_hist = np.log2(hist)
        ii = np.arange(n + 1, dtype=np.float64).reshape(-1, 1)  # i axis
        jj = np.arange(n + 1, dtype=np.float64).reshape(1, -1)  # j axis
        idx = np.arange(n + 1, dtype=np.float64)

        for m in range(1, n + 1):
            m_fact += np.log2(float(m))
            m_quorum = int(np.ceil(m * quorum))

            # 100% quorum part
            n_fall_m += np.log2(n - m + 1.0)
            lo = max(m, c)
            perc_mult[lo:] += np.log2(idx[lo:] - m + 1.0)
            yl = float(np.sum(np.exp2(log_hist[lo:] + perc_mult[lo:] - n_fall_m)))

            # [m_quorum, 100%) part over the (i, j) grid:
            # i in [m_quorum, n), j in [max(m_quorum, c), m)
            yr = 0.0
            j_lo = max(m_quorum, c)
            if m_quorum < n and j_lo < m:
                isl = slice(m_quorum, n)
                jsl = slice(j_lo, m)
                cond = (
                    (n + jj[:, jsl] + 1.0 > ii[isl] + m)
                    & (jj[:, jsl] <= ii[isl])
                )
                if cond.any():
                    qs = q[isl, jsl]
                    init = (qs == 0.0) & cond
                    qs = np.where(init, choose_tab[isl, jsl], qs)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        upd = np.log2(
                            n - ii[isl] - m + 1.0 + jj[:, jsl]
                        ) - np.log2(m - jj[:, jsl])
                    qs = np.where(cond, qs + upd, qs)
                    q[isl, jsl] = qs
                    sum_q = np.sum(
                        np.where(cond, np.exp2(qs + m_fact - n_fall_m), 0.0),
                        axis=1,
                    )
                    add = cond.any(axis=1)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        contrib = np.exp2(
                            log_hist[isl] + np.log2(sum_q)
                        )
                    yr = float(np.sum(np.where(add, contrib, 0.0)))
            pangrowth[m - 1] = yl + yr
        return pangrowth.tolist()

    @classmethod
    def from_coverage_array(cls, count: CountType, cov: np.ndarray) -> "Hist":
        return cls(count, [int(x) for x in cov])
