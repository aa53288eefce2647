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


def vals_to_run_arrays(
    start: int, vals: np.ndarray, decimals: int = 5
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run-length intervals of a dense per-bp vector as arrays:
    (starts, ends, rounded_run_values) — no string formatting.

    Runs are detected on values rounded to ``decimals`` (numpy, C speed).
    Rounding equality == printed-string equality for %.5f-trimmed output
    (negative zero normalized)."""
    n = len(vals)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.float64)
    r = np.round(np.asarray(vals, dtype=np.float64), decimals)
    r[r == 0.0] = 0.0  # normalize -0.0
    boundaries = np.flatnonzero(r[1:] != r[:-1]) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [n]])
    return start + starts, start + ends, r[starts]


def vals_to_interval_arrays(
    start: int, vals: np.ndarray, decimals: int = 5
) -> Tuple[np.ndarray, np.ndarray, list]:
    """Like vals_to_run_arrays, but with each run value formatted
    (each DISTINCT value once — occupancy tracks live on a 101-point
    grid, so formatting cost there is ~constant)."""
    starts, ends, rv = vals_to_run_arrays(start, vals, decimals)
    if len(rv) == 0:
        return starts, ends, []
    uniq, inv = np.unique(rv, return_inverse=True)
    fmt = [format_value(float(u), decimals) for u in uniq]
    labels = [fmt[i] for i in inv]
    return starts, ends, labels


def vals_to_intervals(
    start: int, vals: np.ndarray, decimals: int = 5
) -> Iterator[Tuple[int, int, str]]:
    """Yield (ivl_start, ivl_end, formatted_value) run-length intervals for
    a dense per-bp vector beginning at genomic position ``start``."""
    starts, ends, labels = vals_to_interval_arrays(start, vals, decimals)
    for a, b, v in zip(starts.tolist(), ends.tolist(), labels):
        yield (a, b, v)
