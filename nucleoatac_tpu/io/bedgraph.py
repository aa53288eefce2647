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
    a dense per-bp vector beginning at genomic position ``start``."""
    if len(vals) == 0:
        return
    strs = [format_value(float(v), decimals) for v in vals]
    run_start = 0
    for i in range(1, len(strs)):
        if strs[i] != strs[run_start]:
            yield (start + run_start, start + i, strs[run_start])
            run_start = i
    yield (start + run_start, start + len(strs), strs[run_start])
