"""On-device V-plot rasterization: fragment lists -> [B, S, W] count mats.

Device analogue of reference:pyatac/chunkmat2d.py :: FragmentMat2D
.makeFragmentMat (SURVEY.md §3.1), which scatter-increments (size,
midpoint) cells while iterating pysam reads. Here fragments arrive as
padded fixed-shape (midpoint, size) int32 tensors (DESIGN.md §10) and a
single batched scatter-add builds all window matrices at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rasterize_batch(
    mids: jax.Array,  # [B, F] window-relative midpoints; invalid: any value
    sizes: jax.Array,  # [B, F] adjusted sizes; invalid rows marked by valid
    valid: jax.Array,  # [B, F] bool
    lower: int,
    upper: int,
    width: int,
) -> jax.Array:
    """Returns [B, upper-lower, width] float32 counts.

    Fragments outside the size/window range are dropped (mask folded into
    the scatter update so shapes stay static).
    """
    B, F = mids.shape
    S = upper - lower
    keep = (
        valid
        & (mids >= 0)
        & (mids < width)
        & (sizes >= lower)
        & (sizes < upper)
    )
    s_rel = jnp.clip(sizes - lower, 0, S - 1)
    m = jnp.clip(mids, 0, width - 1)
    flat_idx = s_rel * width + m  # [B, F] in [0, S*W)
    upd = keep.astype(jnp.float32)

    def one(idx_row: jax.Array, upd_row: jax.Array) -> jax.Array:
        z = jnp.zeros((S * width,), jnp.float32)
        return z.at[idx_row].add(upd_row)

    out = jax.vmap(one)(flat_idx, upd)
    return out.reshape(B, S, width)
