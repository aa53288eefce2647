"""Pallas TPU kernel for the diag-matmul template cross-correlation.

The XLA diag path (ops/xcorr.py :: conv_stack_diag) computes
H[b, c, k, w] = sum_s V_c[k, s] * x[b, s, w] as one batched GEMM and then
sums the K static diagonals H[..., k, j+k]. The GEMM itself runs at
~48 TF/s, but H is [B, C, K, W] float32 — ~230 MB per stack at
production shapes — and it makes a full HBM round-trip (write + K
shifted reads) between the GEMM and the diagonal sum. That HBM traffic,
not FLOPs, is most of the measured conv-stage time (PARITY.md roofline:
5.6 ms/batch at 3% MFU).

This kernel fuses the two: per window row, the [C*K, S] @ [S, W] GEMM
runs on the MXU with H kept in VMEM (~1.7 MB), the diagonal skew is ONE
strided lane-rotate (pltpu.roll row r by W-K+1+r; kernel rows are
pre-reversed in k so the per-row rotation equals a left-shift by k —
no negative strides, no in-kernel flips, both of which Mosaic lowers
poorly), and the K-row sum is a plain sublane reduction on the VPU.
HBM traffic drops to reading x once and writing [B, C, W] — ~60x less
than the XLA path.

Why this succeeds where the round-2 row-per-program kernel
(ops/pallas_kernels.py, 57.8 ms) starved: that kernel walked K steps of
[C<=5, S] @ [S, W] matmuls — M<=5 uses <4% of the 128-wide MXU. Here M
is C*K (294 at production shapes), so the systolic array is full.

Wraparound safety: after a left-rotation by k, lanes j >= W-k hold
wrapped values; consumers read only j < W-K+1 <= W-k for every k < K,
so no wrapped lane is ever read (same argument as conv_stack_diag's
static slices).

Reference behavior: the five fragment-side and three bias-side template
footprint reductions of reference:nucleoatac/NucleosomeCalling.py +
multinomial_cov.pyx (SURVEY.md §3.2/§3.4, DESIGN.md §7); only the four
genuinely-2-D reductions run here (see ops/xcorr.py::build_kernels_diag).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _diag_kernel(x_ref, k_ref, out_ref, *, C: int, K: int):
    x = x_ref[0]  # [S, W]
    kf = k_ref[...]  # [C*K, S], rows k-REVERSED within each c block
    W = x.shape[1]
    # one MXU GEMM; H stays in VMEM. Precision MUST be explicit: inside
    # Pallas, jnp.dot's DEFAULT lowers to single-pass bf16 on the MXU
    # (measured 4e-1 rel err vs f32 at this shape with cancellation in
    # the row sums — scripts/probe_pallas_bisect.py cases A-H); HIGHEST
    # runs the f32 multi-pass and lands at 5e-5 (case I).
    H = jnp.dot(
        kf, x,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [C*K, W]
    for c in range(C):  # C is 2 — static unroll
        Hc = H[c * K : (c + 1) * K, :]  # [K, W] (row r <-> kernel tap K-1-r)
        # skew: row r must rotate right by (W-K+1) + r, i.e. left by
        # K-1-r = k -> row[j] == orig[j + k] for j < W - k. Mosaic's
        # strided rotate caps the shift range inside one op at a vreg
        # width AND computes wrong values on real hardware at this shape
        # (interpret mode agrees with numpy, the chip does not — observed
        # 2026-08-20), so build the per-row shift as a BUTTERFLY of
        # uniform rotates + sublane-mask selects: after processing bit b,
        # rows whose index has bit b set have been rotated right by an
        # extra 2^b. ceil(log2 K) = 8 uniform rolls per block — all ops
        # with exact Mosaic support.
        Hc = pltpu.roll(Hc, W - K + 1, 1)  # uniform static part
        row = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
        bit = 1
        while bit < K:
            rolled = pltpu.roll(Hc, bit, 1)
            Hc = jnp.where((row & bit) != 0, rolled, Hc)
            bit <<= 1
        out_ref[0, c, :] = jnp.sum(Hc, axis=0)


def diag_conv_pallas(x: jax.Array, k2d, *, interpret: bool = False):
    """[B, S, W] (x) [C, K, S] -> [B, C, W-K+1] valid xcorr, fused on TPU.

    Drop-in replacement for ops/xcorr.py :: conv_stack_diag (numerics:
    plain f32 MXU dot vs the XLA path's Precision.HIGH bf16x3 — at least
    as accurate against the f64 mirror)."""
    B, S, W = x.shape
    k2d = np.asarray(k2d)
    C, K, S2 = k2d.shape
    assert S2 == S, (S2, S)
    kflat = np.ascontiguousarray(
        k2d[:, ::-1, :].reshape(C * K, S).astype(np.float32)
    )
    out = pl.pallas_call(
        functools.partial(_diag_kernel, C=C, K=K),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, W), lambda b: (b, 0, 0)),
            pl.BlockSpec((C * K, S), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, W), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, W), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), jnp.asarray(kflat))
    return out[:, :, : W - K + 1]


def nuc_conv_outputs_pallas(frag_mat, b0, f2d, f1d, b2d, b1d,
                            *, interpret: bool = False):
    """Drop-in replacement for ops/xcorr.py :: nuc_conv_outputs_diag with
    the 2-D stacks on the fused Pallas kernel (the rank-1 reductions stay
    as cheap XLA 1-D convs of the column sums)."""
    from nucleoatac_tpu.ops.xcorr import conv1d_stack

    f2 = diag_conv_pallas(frag_mat, f2d, interpret=interpret)
    b2 = diag_conv_pallas(b0, b2d, interpret=interpret)
    f1 = conv1d_stack(frag_mat.sum(axis=1), f1d)
    b1 = conv1d_stack(b0.sum(axis=1), b1d)
    fo = jnp.concatenate(
        [f2[:, :1], f1[:, :1], f2[:, 1:2], f1[:, 1:3]], axis=1
    )
    bo = jnp.concatenate([b1, b2], axis=1)
    return fo, bo
