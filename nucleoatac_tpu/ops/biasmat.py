"""On-device expected-fragment (bias) matrix construction.

Device analogue of reference:pyatac/chunkmat2d.py :: BiasMat2D.makeBiasMat
(SURVEY.md §3.1): B0[s, p] = q(s) * exp(B[left] + B[right]) / core row sum,
with left = p - (s-1)//2, right = p + s//2 (DESIGN.md §6). The per-size
shifts are static index matrices, so XLA compiles the gather to cheap
vector selects.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _shift_indices(lower: int, upper: int, width: int):
    s = np.arange(lower, upper)[:, None]
    p = np.arange(width)[None, :]
    li = p - (s - 1) // 2
    ri = p + s // 2
    lv = (li >= 0) & (li < width)
    rv = (ri >= 0) & (ri < width)
    return (
        np.clip(li, 0, width - 1),
        np.clip(ri, 0, width - 1),
        lv,
        rv,
    )


def bias_mat_batch(
    log_bias: jax.Array,  # [B, W] per-bp log insertion bias
    size_probs: jax.Array,  # [S] genome-wide nuc-range size distribution
    lower: int,
    upper: int,
    core_lo: int,
    core_hi: int,
) -> jax.Array:
    """Returns [B, S, W] float32 B0."""
    W = log_bias.shape[1]
    li, ri, lv, rv = _shift_indices(lower, upper, W)
    li = jnp.asarray(li)
    ri = jnp.asarray(ri)
    lv = jnp.asarray(lv)
    rv = jnp.asarray(rv)
    bl = jnp.where(lv[None], jnp.take(log_bias, li, axis=1), 0.0)  # [B, S, W]
    br = jnp.where(rv[None], jnp.take(log_bias, ri, axis=1), 0.0)
    raw = jnp.exp(bl + br)
    core_sum = raw[:, :, core_lo:core_hi].sum(axis=2)  # [B, S]
    core_sum = jnp.where(core_sum > 0, core_sum, 1.0)
    return raw * (size_probs[None, :] / core_sum)[..., None]
