#!/usr/bin/env python
"""Standalone visualizer for panacus TSV outputs.

Equivalent of the reference's scripts/panacus-visualize.py (281 LoC,
matplotlib): reads hist/growth/ordered-growth tables produced by
`panacus hist|growth|histgrowth|ordered-histgrowth`, renders bar/curve
plots, and optionally fits the Heaps'-law gamma of each growth curve.

Usage:
  panacus-visualize.py growth.tsv -o plot.pdf
  panacus-visualize.py hist.tsv --split-subfigures -o plots.png
  panacus-visualize.py growth.tsv --estimate-growth-params -o plot.svg
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np


def read_panacus_table(path: str):
    """Parse the 4-row-header panacus TSV into (index, columns).

    Each column: dict(kind, count, coverage, quorum, values)."""
    rows: List[List[str]] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            rows.append(line.split("\t"))
    if len(rows) < 5 or rows[0][0] != "panacus":
        raise SystemExit(f"{path}: not a panacus table (missing 4-row header)")
    header = rows[:4]
    body = rows[4:]
    ncols = len(header[0])
    index = []
    values: List[List[float]] = [[] for _ in range(ncols - 1)]
    for r in body:
        index.append(r[0])
        for j in range(1, ncols):
            v = r[j] if j < len(r) else "NaN"
            values[j - 1].append(float("nan") if v == "NaN" else float(v))
    cols = []
    for j in range(1, ncols):
        cols.append(
            {
                "kind": header[0][j],
                "count": header[1][j],
                "coverage": header[2][j] if len(header[2]) > j else "",
                "quorum": header[3][j] if len(header[3]) > j else "",
                "values": np.array(values[j - 1]),
            }
        )
    return index, cols


def estimate_growth_params(m: np.ndarray, y: np.ndarray) -> Tuple[float, float]:
    """Fit Heaps' law y = k * m^gamma on the tail of a growth curve."""
    good = np.isfinite(y) & (y > 0) & (m > 0)
    m, y = m[good], y[good]
    if len(m) < 3:
        return float("nan"), float("nan")
    lm, ly = np.log(m), np.log(y)
    gamma, logk = np.polyfit(lm, ly, 1)
    return float(np.exp(logk)), float(gamma)


def main() -> None:
    ap = argparse.ArgumentParser(
        description="visualize panacus hist/growth/ordered-growth tables"
    )
    ap.add_argument("tsv", nargs="+", help="panacus TSV output file(s)")
    ap.add_argument(
        "-o",
        "--output",
        default=None,
        help="output file; default: write the plot to stdout "
        "(reference-compatible `panacus-visualize t.tsv > t.pdf` usage)",
    )
    ap.add_argument(
        "-e",
        "--estimate-growth-params",
        action="store_true",
        help="fit and annotate Heaps'-law k*m^gamma on growth curves",
    )
    ap.add_argument(
        "-l",
        "--legend-location",
        default="best",
        help='matplotlib legend location, e.g. "upper left"',
    )
    ap.add_argument(
        "-f",
        "--format",
        default=None,
        choices=["pdf", "png", "svg"],
        help="output format (default: from -o extension, else pdf)",
    )
    ap.add_argument(
        "-s",
        "--split-subfigures",
        action="store_true",
        help="one subplot per column instead of overlaying growth curves",
    )
    ap.add_argument(
        "--split-prefix",
        default=None,
        help="with -s: write each panel to its own file "
        "<prefix><i>.<format> instead of one multi-panel figure",
    )
    ap.add_argument("--f-width", type=float, default=10.0)
    ap.add_argument("--f-height", type=float, default=6.0)
    args = ap.parse_args()
    ext = (
        os.path.splitext(os.path.basename(args.output))[1][1:].lower()
        if args.output
        else ""
    )
    fmt = args.format or (ext if ext in ("pdf", "png", "svg") else "pdf")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = []
    for path in args.tsv:
        index, cols = read_panacus_table(path)
        hists = [c for c in cols if c["kind"] == "hist"]
        growths = [
            c for c in cols if c["kind"] in ("growth", "ordered-growth")
        ]
        for h in hists:
            panels.append((path, index, "hist", [h]))
        if growths:
            if args.split_subfigures:
                for g in growths:
                    panels.append((path, index, "growth", [g]))
            else:
                panels.append((path, index, "growth", growths))

    if not panels:
        raise SystemExit("no plottable columns found")

    def draw_panel(ax, path, index, kind, cols):
        if kind == "hist":
            c = cols[0]
            x = np.arange(len(c["values"]))
            ax.bar(x, c["values"], color="#2563eb")
            ax.set_yscale("log")
            ax.set_xlabel("taxa")
            ax.set_ylabel(f"#{c['count']}s")
            ax.set_title(f"coverage histogram ({c['count']})", fontsize=10)
        else:
            for i, c in enumerate(cols):
                y = c["values"]
                is_ordered = c["kind"] == "ordered-growth"
                if is_ordered:
                    x = np.arange(1, len(y) + 1, dtype=float)
                else:
                    # index column is the subset size m (row 0 is the NaN row)
                    try:
                        x = np.array([float(v) for v in index], dtype=float)
                    except ValueError:
                        x = np.arange(1, len(y) + 1, dtype=float)
                label = (
                    f"{c['kind']} {c['count']} "
                    f"cov≥{c['coverage']} quorum≥{c['quorum']}"
                )
                if args.estimate_growth_params and not is_ordered:
                    kk, gamma = estimate_growth_params(x, y)
                    if np.isfinite(gamma):
                        label += f"  (k={kk:.1f}, γ={gamma:.3f})"
                        ax.plot(
                            x,
                            kk * x**gamma,
                            linestyle=":",
                            alpha=0.6,
                            color=f"C{i}",
                        )
                ax.plot(x, y, marker="o", markersize=3, color=f"C{i}",
                        label=label)
            if any(c["kind"] == "ordered-growth" for c in cols):
                labels = index[1:] if index and index[0] == "0" else index
                ax.set_xticks(np.arange(1, len(labels) + 1))
                ax.set_xticklabels(labels, rotation=60, fontsize=6)
            ax.set_xlabel("taxa")
            ax.set_ylabel(f"#{cols[0]['count']}s")
            ax.legend(fontsize=7, loc=args.legend_location)
            ax.set_title(path.split("/")[-1], fontsize=10)

    def save(fig, dest):
        fig.tight_layout()
        if dest is None:
            fig.savefig(sys.stdout.buffer, dpi=150, format=fmt)
            sys.stderr.write(f"wrote {fmt} to stdout\n")
        else:
            fig.savefig(dest, dpi=150, format=fmt)
            sys.stderr.write(f"wrote {dest}\n")

    if args.split_prefix is not None:
        for k, (path, index, kind, cols) in enumerate(panels):
            fig, ax = plt.subplots(
                figsize=(args.f_width, args.f_height), squeeze=True
            )
            draw_panel(ax, path, index, kind, cols)
            save(fig, f"{args.split_prefix}{k}.{fmt}")
            plt.close(fig)
        return

    n = len(panels)
    ncols = min(n, 2)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows,
        ncols,
        figsize=(args.f_width, args.f_height * nrows / 2 + 2),
        squeeze=False,
    )
    for k, (path, index, kind, cols) in enumerate(panels):
        draw_panel(axes[k // ncols][k % ncols], path, index, kind, cols)
    for k in range(n, nrows * ncols):
        axes[k // ncols][k % ncols].axis("off")
    save(fig, args.output)


if __name__ == "__main__":
    main()
