"""On-device peak calling: local maxima + greedy non-overlap selection.

Device analogue of reference:pyatac/utils.py :: call_peaks / reduce_peaks
(SURVEY.md §3.1). The reference's data-dependent python loops become
fixed-shape ops (DESIGN.md §10): candidate detection is two sliding
maxima; greedy selection is a fixed-trip-count argmax+suppress lax.scan
returning a padded [B, MAX_CALLS] position list with a validity mask.

Semantics (shared with mirror.local_max_candidates / greedy_select):
a position is a candidate iff it is strictly greater than every value in
the preceding ``halfwin`` positions and >= every value in the following
``halfwin`` (leftmost-of-plateau); greedy selection repeatedly takes the
highest-scoring candidate (ties -> leftmost) and suppresses |d| < sep.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-3.0e38)


def _window_max(x: jax.Array, win: int, side: str) -> jax.Array:
    """Per-position max over the ``win`` strictly-left or strictly-right
    neighbors of [B, W] rows (excluding self), -inf beyond bounds."""
    B, W = x.shape
    if side == "left":
        xp = jnp.pad(x, ((0, 0), (win, 0)), constant_values=_NEG)[:, :-1]
    else:
        xp = jnp.pad(x, ((0, 0), (0, win)), constant_values=_NEG)[:, 1:]
    return jax.lax.reduce_window(
        xp,
        _NEG,
        jax.lax.max,
        window_dimensions=(1, win),
        window_strides=(1, 1),
        padding="VALID",
    )


def local_max_batch(x: jax.Array, halfwin: int, mask: jax.Array) -> jax.Array:
    """x: [B, W] scores; mask: [B, W] bool. Returns bool [B, W] candidates."""
    lm = _window_max(x, halfwin, "left")
    rm = _window_max(x, halfwin, "right")
    return mask & (x > lm) & (x >= rm)


class GreedyOut(NamedTuple):
    positions: jax.Array  # [B, MAX_CALLS] int32, sorted ascending among valid
    valid: jax.Array  # [B, MAX_CALLS] bool


def greedy_select_batch(
    scores: jax.Array,  # [B, W]
    candidates: jax.Array,  # [B, W] bool
    sep: int,
    max_calls: int,
) -> GreedyOut:
    B, W = scores.shape
    pos_idx = jnp.arange(W, dtype=jnp.int32)[None, :]

    def step(live_scores: jax.Array, _):
        p = jnp.argmax(live_scores, axis=1).astype(jnp.int32)  # [B]
        val = jnp.take_along_axis(live_scores, p[:, None], axis=1)[:, 0]
        ok = val > _NEG / 2
        suppress = jnp.abs(pos_idx - p[:, None]) < sep
        live_scores = jnp.where(suppress, _NEG, live_scores)
        return live_scores, (p, ok)

    init = jnp.where(candidates, scores, _NEG)
    _, (ps, oks) = jax.lax.scan(step, init, None, length=max_calls)
    positions = ps.T  # [B, MAX_CALLS]
    valid = oks.T
    # sort ascending by position, invalid entries pushed to the end
    sort_key = jnp.where(valid, positions, jnp.int32(W + 1))
    order = jnp.argsort(sort_key, axis=1)
    return GreedyOut(
        positions=jnp.take_along_axis(positions, order, axis=1),
        valid=jnp.take_along_axis(valid, order, axis=1),
    )
