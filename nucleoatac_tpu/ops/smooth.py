"""Gaussian smoothing of batched 1-D tracks (DESIGN.md §7).

Device analogue of reference:pyatac/utils.py :: smooth (SURVEY.md §3.1);
zero-padded 'same' convolution with a normalized gaussian kernel of
halfwidth round(3*sd) — identical to mirror.gauss_smooth.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gauss_kernel(sd: float) -> np.ndarray:
    if sd <= 0:
        return np.array([1.0], dtype=np.float32)
    hw = max(1, int(round(3 * sd)))
    t = np.arange(-hw, hw + 1, dtype=np.float64)
    k = np.exp(-0.5 * (t / sd) ** 2)
    return (k / k.sum()).astype(np.float32)


def gauss_smooth_batch(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """x: [B, W]; kernel: [K] (odd). Returns [B, W]."""
    K = kernel.shape[0]
    hw = K // 2
    xp = jnp.pad(x, ((0, 0), (hw, hw)))[:, None, :]  # [B, 1, W+2hw]
    kern = kernel[None, None, ::-1]  # conv flips; gaussian symmetric anyway
    out = jax.lax.conv_general_dilated(
        xp,
        kern,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out[:, 0, :]
