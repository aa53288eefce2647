"""Fused Pallas TPU kernel for the nuc-scoring hot path.

TPU-native rebuild of reference:nucleoatac/multinomial_cov.pyx (the
Cython sliding multinomial-variance loop) fused with the template
cross-correlations and normalization of
reference:nucleoatac/NucleosomeCalling.py (SURVEY.md §3.4 item 1,
DESIGN.md §7): one kernel computes, per window row, all eight footprint
convolutions (5 over the fragment matrix, 3 over the bias matrix) as a
K-deep loop of [C, S] @ [S, W] MXU matmuls over VMEM-resident rows, then
finishes the elementwise signal/background/variance/LR/fuzziness math on
the VPU — no HBM round-trips between stages.

Grid: (B,) — one program per window row; the whole halo-padded row lives
in VMEM (~1.1 MB at S=146, Wp≈2048). The K-deep conv walks the row with
`pltpu.roll` (one lane per iteration, loop-carried): Mosaic rejects
dynamic lane-dim slices on refs (`dynamic_slice` unimplemented for the
TC kernel type — observed on the axon backend), and an unrolled version
kept all K shifted copies live and OOM'd scoped VMEM, so the rotate is
the only shape that both lowers and fits. Wraparound lanes from the roll
are only ever in columns >= W and are never read. Positions whose
template footprint leaves the window are zeroed by a static edge mask,
matching mirror.nuc_scores.
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


def _kernel(fmat_ref, b0_ref, fk_ref, bk_ref, mask_ref, out_ref, *, K, W,
            var_floor):
    """Refs (leading block dim of 1 squeezed by indexing):
    fmat_ref/b0_ref: [1, S, Wp] halo-padded window rows (Wp >= W + K - 1)
    fk_ref: [5, S, K]; bk_ref: [3, S, K]; mask_ref: [1, 1, W]
    out_ref: [1, 5, W] -> rows (norm, signal, lr, fuzz, n)
    """
    xf = fmat_ref[0, :, :]  # [S, Wp]
    xb = b0_ref[0, :, :]
    fk = fk_ref[:, :, :]  # [5, S, K]
    bk = bk_ref[:, :, :]  # [3, S, K]

    def body(k, carry):
        del k
        acc_f, acc_b, cf, cb, rfk, rbk = carry
        # after k left-rotations, cf[:, :W] == x[:, k : k + W] and
        # rfk[:, :, 0] == fk[:, :, k] — all slices static; Mosaic has no
        # dynamic_slice for values, so the loop index never indexes
        acc_f = acc_f + jnp.dot(
            rfk[:, :, 0], cf[:, :W], preferred_element_type=jnp.float32
        )
        acc_b = acc_b + jnp.dot(
            rbk[:, :, 0], cb[:, :W], preferred_element_type=jnp.float32
        )
        # left-rotate by one lane (pltpu.roll requires non-negative shift:
        # rolling right by dim - 1 == rolling left by 1)
        return (
            acc_f,
            acc_b,
            pltpu.roll(cf, cf.shape[1] - 1, 1),
            pltpu.roll(cb, cb.shape[1] - 1, 1),
            pltpu.roll(rfk, rfk.shape[2] - 1, 2),
            pltpu.roll(rbk, rbk.shape[2] - 1, 2),
        )

    init = (
        jnp.zeros((5, W), jnp.float32),
        jnp.zeros((3, W), jnp.float32),
        xf,
        xb,
        fk,
        bk,
    )
    fo, bo, _, _, _, _ = jax.lax.fori_loop(0, K, body, init)

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
    tile_w: int | None = None,  # unused; kept for call-site compatibility
    interpret: bool = False,
) -> NucScoresPallasOut:
    del tile_w
    B, S, W = frag_mat.shape
    K = f_kernels.shape[2]
    half = K // 2

    # halo-pad to Wp = W + K - 1, then up to a lane multiple so the rotate
    # never wraps live data into columns [0, W)
    right = K - 1 - half
    Wp = -(-(W + K - 1) // 128) * 128
    lane_pad = Wp - (W + K - 1)
    fe = jnp.pad(frag_mat, ((0, 0), (0, 0), (half, right + lane_pad)))
    be = jnp.pad(b0, ((0, 0), (0, 0), (half, right + lane_pad)))

    # static edge mask: dyad positions with a full in-window footprint
    pos = np.arange(W)
    mask_full = ((pos >= half) & (pos < W - half)).astype(np.float32)
    mask = jnp.asarray(mask_full.reshape(1, 1, W))

    grid = (B,)
    kern = functools.partial(_kernel, K=K, W=W, var_floor=var_floor)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, Wp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Wp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, S, K), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, S, K), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 5, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 5, W), jnp.float32),
        interpret=interpret,
    )(fe, be, f_kernels, b_kernels, mask)
    return NucScoresPallasOut(
        norm=out[:, 0], signal=out[:, 1], lr=out[:, 2], fuzz=out[:, 3], n=out[:, 4]
    )
