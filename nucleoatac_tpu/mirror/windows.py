"""Float64 numpy reference implementations of all per-window math.

Normative formulas: DESIGN.md §4, §6, §7. Reference behavior being
mirrored: nucleoatac/Occupancy.py (occupancy MLE + LR CI),
nucleoatac/NucleosomeCalling.py (xcorr signal/background/variance/LR),
nucleoatac/multinomial_cov.pyx (variance), pyatac/chunkmat2d.py
(FragmentMat2D/BiasMat2D rasterization) — SURVEY.md §3.1–3.2.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


def rasterize(
    mids: np.ndarray, sizes: np.ndarray, lower: int, upper: int, width: int
) -> np.ndarray:
    """Fragment (midpoint, size) lists -> dense [upper-lower, width] count
    matrix. ``mids`` are window-relative; out-of-range entries dropped."""
    mids = np.asarray(mids, dtype=np.int64)
    sizes = np.asarray(sizes, dtype=np.int64)
    keep = (mids >= 0) & (mids < width) & (sizes >= lower) & (sizes < upper)
    m, s = mids[keep], sizes[keep]
    mat = np.zeros((upper - lower, width), dtype=np.int64)
    np.add.at(mat, (s - lower, m), 1)
    return mat


def sliding_counts(mat: np.ndarray, flank: int) -> np.ndarray:
    """counts[p, s] = sum over positions [p-flank, p+flank] of mat[s, ·]
    (zero outside the array). mat is [S, W]; returns [W, S] int64."""
    S, W = mat.shape
    c = np.cumsum(mat, axis=1, dtype=np.int64)
    c = np.concatenate([np.zeros((S, 1), dtype=np.int64), c], axis=1)  # c[:, p] = sum < p
    hi = np.minimum(np.arange(W) + flank + 1, W)
    lo = np.maximum(np.arange(W) - flank, 0)
    return (c[:, hi] - c[:, lo]).T


class OccResult(NamedTuple):
    occ: np.ndarray
    lower: np.ndarray
    upper: np.ndarray
    n: np.ndarray
    ll: np.ndarray  # [W, G]


def occupancy_window(
    mat: np.ndarray,
    log_mix: np.ndarray,
    alpha_grid: np.ndarray,
    flank: int,
    ci_drop: float = 1.92,
) -> OccResult:
    """Per-position occupancy MLE over the alpha grid + LR CI (DESIGN §4).

    mat: [S, W] integer counts over the full size support.
    log_mix: [S, G] float64 table; alpha_grid: [G].
    """
    counts = sliding_counts(mat, flank).astype(np.float64)  # [W, S]
    ll = counts @ log_mix  # [W, G]
    n = counts.sum(axis=1)
    best = np.argmax(ll, axis=1)  # first occurrence = lowest alpha on ties
    occ = alpha_grid[best]
    llmax = ll[np.arange(ll.shape[0]), best]
    ok = ll >= (llmax[:, None] - ci_drop)
    G = len(alpha_grid)
    first = np.argmax(ok, axis=1)
    last = G - 1 - np.argmax(ok[:, ::-1], axis=1)
    lower = alpha_grid[first]
    upper = alpha_grid[last]
    empty = n == 0
    occ = np.where(empty, 0.0, occ)
    lower = np.where(empty, 0.0, lower)
    upper = np.where(empty, 1.0, upper)
    return OccResult(occ, lower, upper, n, ll)


def bias_mat(
    log_bias: np.ndarray,
    size_probs: np.ndarray,
    lower: int,
    upper: int,
    core_lo: int,
    core_hi: int,
) -> np.ndarray:
    """Expected fragment matrix B0[s, p] (DESIGN §6).

    log_bias: [W] per-bp log insertion bias; size_probs q(s): [upper-lower]
    genome-wide nuc-range size distribution (sums to 1).
    Braw[s, p] = exp(B[p - (s-1)//2] + B[p + s//2]), index-clipped entries
    get bias 0 contribution (treated as log-bias 0 outside the window);
    each row normalized over the core [core_lo, core_hi) then scaled by q(s).
    """
    W = log_bias.shape[0]
    S = upper - lower
    p = np.arange(W)
    out = np.zeros((S, W), dtype=np.float64)
    for si in range(S):
        s = lower + si
        li = p - (s - 1) // 2
        ri = p + s // 2
        bl = np.where((li >= 0) & (li < W), log_bias[np.clip(li, 0, W - 1)], 0.0)
        br = np.where((ri >= 0) & (ri < W), log_bias[np.clip(ri, 0, W - 1)], 0.0)
        out[si] = np.exp(bl + br)
    core_sum = out[:, core_lo:core_hi].sum(axis=1)
    core_sum = np.where(core_sum > 0, core_sum, 1.0)
    return out * (size_probs / core_sum)[:, None]


class NucScores(NamedTuple):
    """All dyad-indexed score tracks; index d corresponds to footprint
    starting at d - K//2, valid for d in [K//2, W - K//2)."""

    signal: np.ndarray
    n: np.ndarray
    exp_signal: np.ndarray
    var: np.ndarray
    norm: np.ndarray
    lr: np.ndarray
    fuzz: np.ndarray


def _corr_rows(mat: np.ndarray, kern: np.ndarray) -> np.ndarray:
    """sum_{s,k} kern[s,k] * mat[s, j+k] for each valid j. [S,W]x[S,K]->[W-K+1]."""
    S, W = mat.shape
    K = kern.shape[1]
    out = np.zeros(W - K + 1, dtype=np.float64)
    for s in range(S):
        out += np.correlate(mat[s], kern[s], mode="valid")
    return out


def nuc_scores(
    frag_mat: np.ndarray,
    b0: np.ndarray,
    vmat: np.ndarray,
    v_floor: float = 1e-5,
    var_floor: float = 1e-12,
) -> NucScores:
    """Template xcorr scoring (DESIGN §7). frag_mat/b0: [S, W], vmat: [S, K].

    Outputs are length W (dyad-indexed); positions without a full footprint
    are zero.
    """
    S, W = frag_mat.shape
    K = vmat.shape[1]
    half = K // 2
    F = frag_mat.astype(np.float64)
    ones = np.ones_like(vmat)

    signal_v = _corr_rows(F, vmat)
    n_v = _corr_rows(F, ones)
    bsum_v = _corr_rows(b0, ones)
    vb_v = _corr_rows(b0, vmat)
    v2b_v = _corr_rows(b0, vmat * vmat)
    logv = np.log(np.maximum(vmat, v_floor))
    flogv_v = _corr_rows(F, logv)
    offs = (np.arange(K, dtype=np.float64) - half)[None, :] * np.ones((S, 1))
    fo_v = _corr_rows(F, offs)
    fo2_v = _corr_rows(F, offs * offs)

    def pad(x: np.ndarray) -> np.ndarray:
        out = np.zeros(W, dtype=np.float64)
        out[half : half + len(x)] = x
        return out

    signal, n, bsum = pad(signal_v), pad(n_v), pad(bsum_v)
    vb, v2b, flogv = pad(vb_v), pad(v2b_v), pad(flogv_v)
    fo, fo2 = pad(fo_v), pad(fo2_v)

    safe_b = np.where(bsum > 0, bsum, 1.0)
    mu = vb / safe_b
    mu2 = v2b / safe_b
    exp_signal = n * mu
    var = n * (mu2 - mu * mu)
    ok = (var > var_floor) & (n > 0)
    norm = np.where(ok, (signal - exp_signal) / np.sqrt(np.where(ok, var, 1.0)), 0.0)
    lr = np.where(n > 0, flogv - n * np.log(np.maximum(mu, 1e-300)), 0.0)
    safe_n = np.where(n > 0, n, 1.0)
    m1 = fo / safe_n
    m2 = fo2 / safe_n
    fuzz = np.where(n > 0, np.sqrt(np.maximum(m2 - m1 * m1, 0.0)), 0.0)
    return NucScores(signal, n, exp_signal, var, norm, lr, fuzz)


def gauss_smooth(x: np.ndarray, sd: float) -> np.ndarray:
    """Zero-padded 'same' convolution with a normalized gaussian,
    halfwidth = round(3*sd) (DESIGN §7)."""
    if sd <= 0:
        return x.astype(np.float64).copy()
    hw = max(1, int(round(3 * sd)))
    t = np.arange(-hw, hw + 1, dtype=np.float64)
    k = np.exp(-0.5 * (t / sd) ** 2)
    k /= k.sum()
    return np.convolve(x.astype(np.float64), k, mode="same")


def local_max_candidates(
    x: np.ndarray, halfwin: int, mask: np.ndarray | None = None
) -> np.ndarray:
    """Boolean: p is a candidate iff x[p] > all window values strictly to
    its left and >= all strictly to its right (leftmost-of-plateau), within
    ±halfwin, and mask[p] (DESIGN §4/§7 peak semantics)."""
    W = len(x)
    cand = np.zeros(W, dtype=bool)
    for p in range(W):
        if mask is not None and not mask[p]:
            continue
        lo = max(0, p - halfwin)
        hi = min(W, p + halfwin + 1)
        left = x[lo:p]
        right = x[p + 1 : hi]
        if (left.size == 0 or x[p] > left.max()) and (
            right.size == 0 or x[p] >= right.max()
        ):
            cand[p] = True
    return cand


def greedy_select(
    scores: np.ndarray, candidates: np.ndarray, sep: int, max_calls: int = 1 << 30
) -> list[int]:
    """Greedy non-overlap selection: repeatedly take the highest-scoring
    candidate (ties -> leftmost), discard candidates within < sep of it."""
    live = candidates.copy()
    sel: list[int] = []
    while len(sel) < max_calls and live.any():
        masked = np.where(live, scores, -np.inf)
        p = int(np.argmax(masked))
        if not np.isfinite(masked[p]):
            break
        sel.append(p)
        lo = max(0, p - sep + 1)
        hi = min(len(live), p + sep)
        live[lo:hi] = False
    return sorted(sel)
