"""Fused Pallas TPU kernels for the nuc-scoring hot path.

TPU-native rebuild of reference:nucleoatac/multinomial_cov.pyx (the
Cython sliding multinomial-variance loop) fused with the template
cross-correlations and normalization of
reference:nucleoatac/NucleosomeCalling.py (SURVEY.md §3.4 item 1,
DESIGN.md §7): one kernel computes, per output-position tile, all eight
footprint convolutions (5 over the fragment matrix, 3 over the bias
matrix) as a K-deep loop of [C, S] @ [S, TILE] MXU matmuls over
VMEM-resident slices, then finishes the elementwise
signal/background/variance/LR/fuzziness math on the VPU — no HBM
round-trips between stages and no XLA fusion decisions (which miscompile
on the axon backend; see models/engine.py docstring).

Grid: (B, W // TILE_W). The full halo-padded window row lives in VMEM
(~1 MB at S=146, W=1536); each program slices its overlapping slab with
pl.ds. Output positions are dyad-aligned; positions whose footprint
leaves the window are zeroed by a static edge mask, matching
mirror.nuc_scores.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class NucScoresPallasOut(NamedTuple):
    norm: jax.Array
    signal: jax.Array
    lr: jax.Array
    fuzz: jax.Array
    n: jax.Array


def _kernel(fmat_ref, b0_ref, fk_ref, bk_ref, mask_ref, out_ref, *, K, tile_w,
            var_floor):
    """Refs (leading block dim of 1 squeezed by indexing):
    fmat_ref/b0_ref: [1, S, Wp] halo-padded full window rows
    fk_ref: [5, S, K]; bk_ref: [3, S, K]; mask_ref: [1, 1, tile_w]
    out_ref: [1, 5, tile_w] -> rows (norm, signal, lr, fuzz, n)
    """
    j = pl.program_id(1)
    start = j * tile_w

    def conv_accumulate(x_ref, kern_ref, C):
        def body(k, acc):
            xk = x_ref[0, :, pl.ds(start + k, tile_w)]  # [S, tile_w]
            kk = kern_ref[:, :, k]  # [C, S]
            return acc + jnp.dot(kk, xk, preferred_element_type=jnp.float32)

        init = jnp.zeros((C, tile_w), jnp.float32)
        return jax.lax.fori_loop(0, K, body, init)

    fo = conv_accumulate(fmat_ref, fk_ref, 5)  # V, ones, logV, offs, offs^2
    bo = conv_accumulate(b0_ref, bk_ref, 3)  # ones, V, V^2

    signal, n, flogv, foff, foff2 = fo[0], fo[1], fo[2], fo[3], fo[4]
    bsum, vb, v2b = bo[0], bo[1], bo[2]

    safe_b = jnp.where(bsum > 0, bsum, 1.0)
    mu = vb / safe_b
    mu2 = v2b / safe_b
    exp_signal = n * mu
    var = n * (mu2 - mu * mu)
    ok = (var > var_floor) & (n > 0)
    norm = jnp.where(
        ok, (signal - exp_signal) * jax.lax.rsqrt(jnp.where(ok, var, 1.0)), 0.0
    )
    lr = jnp.where(n > 0, flogv - n * jnp.log(jnp.maximum(mu, 1e-30)), 0.0)
    safe_n = jnp.where(n > 0, n, 1.0)
    m1 = foff / safe_n
    m2 = foff2 / safe_n
    fuzz = jnp.where(n > 0, jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0)), 0.0)

    mask = mask_ref[0, 0]
    out_ref[0, :, :] = jnp.stack([norm, signal, lr, fuzz, n]) * mask[None, :]


def nuc_scores_pallas(
    frag_mat: jax.Array,  # [B, S, W] float32
    b0: jax.Array,  # [B, S, W] float32
    f_kernels: jax.Array,  # [5, S, K]
    b_kernels: jax.Array,  # [3, S, K]
    var_floor: float = 1e-12,
    tile_w: int = 512,
    interpret: bool = False,
) -> NucScoresPallasOut:
    B, S, W = frag_mat.shape
    K = f_kernels.shape[2]
    half = K // 2
    if W % tile_w != 0:
        raise ValueError(f"W={W} not a multiple of tile_w={tile_w}")

    # halo so slab [start, start + tile_w + K - 1) is in-bounds; pad the
    # right edge up to a lane multiple for clean VMEM tiling
    right = half + ((-(W + K - 1)) % 128)
    fe = jnp.pad(frag_mat, ((0, 0), (0, 0), (half, right)))
    be = jnp.pad(b0, ((0, 0), (0, 0), (half, right)))
    Wp = W + half + right

    # static edge mask: dyad positions with a full in-window footprint
    pos = np.arange(W)
    mask_full = ((pos >= half) & (pos < W - half)).astype(np.float32)
    mask_tiles = jnp.asarray(mask_full.reshape(W // tile_w, 1, tile_w))

    grid = (B, W // tile_w)
    kern = functools.partial(_kernel, K=K, tile_w=tile_w, var_floor=var_floor)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, Wp), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Wp), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, S, K), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, S, K), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_w), lambda b, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 5, tile_w), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 5, W), jnp.float32),
        interpret=interpret,
    )(fe, be, f_kernels, b_kernels, mask_tiles)
    return NucScoresPallasOut(
        norm=out[:, 0], signal=out[:, 1], lr=out[:, 2], fuzz=out[:, 3], n=out[:, 4]
    )
