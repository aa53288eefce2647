"""Fast vectorized host numerics (peak calling on assembled chunk tracks).

Rebuild of reference:pyatac/utils.py :: call_peaks / reduce_peaks
(SURVEY.md §3.1). Semantics identical to the float64 mirror
(mirror/windows.py :: local_max_candidates / greedy_select — the oracle);
these versions are numpy-vectorized so per-chunk host peak calling never
becomes the bottleneck. Peak calling runs on host per chunk (not per
device tile) so greedy separation is enforced across tile boundaries.
"""
from __future__ import annotations

import numpy as np


def local_max_candidates_fast(
    x: np.ndarray, halfwin: int, mask: np.ndarray | None = None
) -> np.ndarray:
    """Vectorized equivalent of mirror.local_max_candidates: strict > to the
    left, >= to the right, within ±halfwin (leftmost-of-plateau)."""
    W = len(x)
    if W == 0:
        return np.zeros(0, dtype=bool)
    neg = -np.inf
    padded_l = np.concatenate([np.full(halfwin, neg), x[:-1]]) if W > 1 else np.full(halfwin, neg)
    if W > 1:
        lm = np.max(
            np.lib.stride_tricks.sliding_window_view(padded_l, halfwin), axis=1
        )
    else:
        lm = np.array([neg])
    padded_r = np.concatenate([x[1:], np.full(halfwin, neg)]) if W > 1 else np.full(halfwin, neg)
    if W > 1:
        rm = np.max(
            np.lib.stride_tricks.sliding_window_view(padded_r, halfwin), axis=1
        )
    else:
        rm = np.array([neg])
    cand = (x > lm) & (x >= rm)
    if mask is not None:
        cand &= mask
    return cand


def greedy_select_fast(
    scores: np.ndarray, candidates: np.ndarray, sep: int
) -> list[int]:
    """Equivalent of mirror.greedy_select but O(C log C) over candidates
    only: process candidates in (-score, position) order, keep those at
    distance >= sep from every kept position."""
    idx = np.flatnonzero(candidates)
    if len(idx) == 0:
        return []
    order = np.lexsort((idx, -scores[idx]))
    taken = np.zeros(len(scores), dtype=bool)
    kept: list[int] = []
    for p in idx[order]:
        if taken[p]:
            continue
        kept.append(int(p))
        lo = max(0, p - sep + 1)
        hi = min(len(scores), p + sep)
        taken[lo:hi] = True
    return sorted(kept)


def local_max_margin_fast(x: np.ndarray, halfwin: int) -> np.ndarray:
    """Signed local-max margin: x[p] - max(window values excluding p,
    within ±halfwin). Positive margin == strict local max. Used by the
    nuc-stage tie guard (models/nuc.py): a decision whose |margin| clears
    the f32-vs-f64 error bound provably agrees with the float64 mirror."""
    W = len(x)
    if W == 0:
        return np.zeros(0)
    neg = -np.inf
    padded_l = (
        np.concatenate([np.full(halfwin, neg), x[:-1]])
        if W > 1 else np.full(halfwin, neg)
    )
    lm = (
        np.max(np.lib.stride_tricks.sliding_window_view(padded_l, halfwin), axis=1)
        if W > 1 else np.array([neg])
    )
    padded_r = (
        np.concatenate([x[1:], np.full(halfwin, neg)])
        if W > 1 else np.full(halfwin, neg)
    )
    rm = (
        np.max(np.lib.stride_tricks.sliding_window_view(padded_r, halfwin), axis=1)
        if W > 1 else np.array([neg])
    )
    return x - np.maximum(lm, rm)
