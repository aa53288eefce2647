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
    start = pl.multiple_of(j * tile_w, 128)
    S = fmat_ref.shape[1]
    slab_w = tile_w + ((K - 1 + 127) // 128) * 128  # lane-aligned slab

    # One aligned VMEM load per input; the K-deep conv walks the slab by
    # rolling it one lane per iteration (loop-carried, constant VMEM —
    # an unrolled version kept all K slices live and OOM'd scoped vmem;
    # dynamic unaligned lane slices are rejected by Mosaic).
    xf = fmat_ref[0, :, pl.ds(start, slab_w)]  # [S, slab_w]
    xb = b0_ref[0, :, pl.ds(start, slab_w)]
    fk = fk_ref[:, :, :]  # [5, S, K]
    bk = bk_ref[:, :, :]  # [3, S, K]

    def body(k, carry):
        acc_f, acc_b, cf, cb = carry
        acc_f = acc_f + jnp.dot(
            fk[:, :, k], cf[:, :tile_w], preferred_element_type=jnp.float32
        )
        acc_b = acc_b + jnp.dot(
            bk[:, :, k], cb[:, :tile_w], preferred_element_type=jnp.float32
        )
        # left-rotate by one lane (pltpu.roll requires non-negative shift:
        # rolling right by slab_w - 1 == rolling left by 1)
        shift = cf.shape[1] - 1
        return (acc_f, acc_b, pltpu.roll(cf, shift, 1), pltpu.roll(cb, shift, 1))

    init = (
        jnp.zeros((5, tile_w), jnp.float32),
        jnp.zeros((3, tile_w), jnp.float32),
        xf,
        xb,
    )
    fo, bo, _, _ = jax.lax.fori_loop(0, K, body, init)

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

    # halo so the lane-aligned slab [start, start + tile_w + ceil128(K-1))
    # is in-bounds for every tile
    slab_extra = ((K - 1 + 127) // 128) * 128
    right = slab_extra - half
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
