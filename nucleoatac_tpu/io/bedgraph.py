"""Bedgraph emission: value vectors -> run-length merged intervals.

Rebuild of reference:pyatac/bedgraph.py / tracks.py vals_to_bedgraph
(SURVEY.md §3.1). Values are formatted FIRST and runs merged on the
formatted string, so the run-length surface is exactly the printed
surface (DESIGN.md §11 bit-stability note).
"""
from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np


def format_value(v: float, decimals: int = 5) -> str:
    """%.<d>f with trailing zeros (and a trailing dot) trimmed; -0 -> 0."""
    s = f"{v:.{decimals}f}".rstrip("0").rstrip(".")
    if s in ("-0", ""):
        s = "0"
    return s


def vals_to_intervals(
    start: int, vals: np.ndarray, decimals: int = 5
) -> Iterator[Tuple[int, int, str]]:
    """Yield (ivl_start, ivl_end, formatted_value) run-length intervals for
    a dense per-bp vector beginning at genomic position ``start``.

    Runs are detected on values rounded to ``decimals`` (numpy, C speed —
    a python-level per-bp loop dominated genome-scale runs); each run is
    then formatted once. Rounding equality == printed-string equality for
    %.5f-trimmed output (negative zero normalized)."""
    n = len(vals)
    if n == 0:
        return
    r = np.round(np.asarray(vals, dtype=np.float64), decimals)
    r[r == 0.0] = 0.0  # normalize -0.0
    boundaries = np.flatnonzero(r[1:] != r[:-1]) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [n]])
    for a, b in zip(starts, ends):
        yield (start + int(a), start + int(b), format_value(float(r[a]), decimals))
