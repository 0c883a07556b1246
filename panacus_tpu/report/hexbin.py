"""Hexagonal binning of (coverage, log-length) node scatter
(reference: src/html_report.rs:769-858)."""

from __future__ import annotations

import math
from typing import Dict, List, Tuple


def hexbin(
    points: List[Tuple[int, int, float]], nx: int, ny: int
) -> List[Dict]:
    """points: (item_id, coverage, log10 length). Returns bins with x, y,
    size, content — dual-grid ('black'/'green') hex assignment like the
    reference."""
    if not points:
        return []
    max_coverage = max(p[1] for p in points)
    max_length = max(p[2] for p in points)
    dx = max_coverage / (nx - 1)
    dy = max_length / (ny - 1)
    bins: Dict[Tuple[bool, int, int], Dict] = {}
    for iid, cov, ln in points:
        black_x = math.floor(cov / dx) * dx
        black_y = math.floor(ln / dy) * dy
        green_x = math.floor((cov - dx / 2.0) / dx) * dx + dx / 2.0
        green_y = math.floor((ln - dy / 2.0) / dy) * dy + dy / 2.0
        if black_x < green_x:
            black_x += dx
        else:
            green_x += dx
        if black_y < green_y:
            black_y += dy
        else:
            green_y += dy
        if _dist(cov, ln, black_x, black_y) < _dist(cov, ln, green_x, green_y):
            key = (False, int(black_x / dx), int(black_y / dy))
            b = bins.setdefault(
                key, {"x": black_x, "y": black_y, "size": 0, "content": []}
            )
        else:
            key = (
                True,
                int((green_x - dx / 2.0) / dx),
                int((green_y - dy / 2.0) / dy),
            )
            b = bins.setdefault(
                key, {"x": green_x, "y": green_y, "size": 0, "content": []}
            )
        b["content"].append(iid)
    out = list(bins.values())
    for b in out:
        b["size"] = len(b["content"])
    return out


def _dist(x1, y1, x2, y2) -> float:
    return math.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
