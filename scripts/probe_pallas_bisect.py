#!/usr/bin/env python
"""Bisect the pallas_diag hardware mismatch: dot vs roll vs skew.

diag_conv_pallas matches the XLA path in interpret mode but is off by
O(1) on the real chip (probe_pallas_diag.py, 2026-08-20). Three minimal
kernels at the same shapes isolate the faulty op:
  A. dot+rowsum only (no rolls): out[c,j] = sum_r H[cK+r, j]
  B. uniform roll only: roll([K, W] input by 1390 lanes)
  C. butterfly skew only (uniform rolls + iota mask selects), no dot
  D. dot with the contraction dim zero-padded to 256 in-kernel
  E. dot + all-row sum (no sublane-misaligned slicing)
  F. dot + 8-aligned block slices (Kp=152 zero-padded kernel rows)
  G. M=128 dot alone
  H. full H via three chunked M<=128 dots
  I. full dot at precision=HIGHEST
Each compares against numpy on host. Run ALONE on the tunnel.

Measured 2026-08-20 (axon TPU v5e, S=146, W=1536, C=2, K=147):
  A 4.33e-01  B 0.00e+00  C 0.00e+00  D 4.33e-01  E 7.08e-01
  F 4.33e-01  G 6.59e-02  H 4.33e-01  I 5.34e-05
Verdict: rolls (uniform + butterfly) are EXACT; the dot is wrong at
every M/padding/alignment variant until precision is explicit —
in-Pallas jnp.dot DEFAULTS to single-pass bf16 on the MXU (G's 6.6e-2
is bf16-epsilon-scale error amplified by row-sum cancellation in A/E/
F/H). Fix: precision=HIGHEST (or HIGH) on every in-kernel dot —
applied in ops/pallas_diag.py. Separately, the STRIDED roll form
(tpu.dynamic_rotate with stride) first refused to compile (max shift in
a vreg > 128) and then computed wrong values at [147, 1536] while
interpret mode agreed with numpy — the butterfly of uniform rotates is
the reliable skew.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nucleoatac_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    S, W, C, K = 146, 1536, 2, 147
    rng = np.random.default_rng(0)
    x = rng.random((S, W)).astype(np.float32)
    kf = rng.standard_normal((C * K, S)).astype(np.float32)
    print(f"device: {jax.devices()[0]}", flush=True)

    # --- A: dot + row-sum, no rolls ---------------------------------------
    def ka(x_ref, k_ref, out_ref):
        H = jnp.dot(k_ref[...], x_ref[...],
                    preferred_element_type=jnp.float32)  # [C*K, W]
        for c in range(C):
            out_ref[c, :] = jnp.sum(H[c * K : (c + 1) * K, :], axis=0)

    t0 = time.perf_counter()
    outa = np.asarray(
        pl.pallas_call(
            ka,
            out_shape=jax.ShapeDtypeStruct((C, W), jnp.float32),
        )(jnp.asarray(x), jnp.asarray(kf))
    )
    H = kf @ x
    refa = np.stack([H[c * K : (c + 1) * K].sum(0) for c in range(C)])
    erra = np.abs(outa - refa) / np.maximum(np.abs(refa), 1)
    print(f"A dot+rowsum: rel err {erra.max():.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- B: uniform roll by W-K+1 ----------------------------------------
    def kb(x_ref, out_ref):
        out_ref[...] = pltpu.roll(x_ref[...], W - K + 1, 1)

    xb = rng.random((K, W)).astype(np.float32)
    t0 = time.perf_counter()
    outb = np.asarray(
        pl.pallas_call(
            kb, out_shape=jax.ShapeDtypeStruct((K, W), jnp.float32)
        )(jnp.asarray(xb))
    )
    refb = np.roll(xb, W - K + 1, axis=1)
    errb = np.abs(outb - refb).max()
    print(f"B uniform roll: abs err {errb:.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- C: butterfly skew, no dot ----------------------------------------
    def kc(x_ref, out_ref):
        Hc = pltpu.roll(x_ref[...], W - K + 1, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
        bit = 1
        while bit < K:
            rolled = pltpu.roll(Hc, bit, 1)
            Hc = jnp.where((row & bit) != 0, rolled, Hc)
            bit <<= 1
        out_ref[...] = Hc

    t0 = time.perf_counter()
    outc = np.asarray(
        pl.pallas_call(
            kc, out_shape=jax.ShapeDtypeStruct((K, W), jnp.float32)
        )(jnp.asarray(xb))
    )
    refc = np.stack(
        [np.roll(xb[r], (W - K + 1 + r) % W) for r in range(K)]
    )
    errc = np.abs(outc - refc).max()
    print(f"C butterfly skew: abs err {errc:.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- D: dot with in-kernel zero-pad of the contraction dim ------------
    Sp = 256

    def kd(x_ref, k_ref, out_ref):
        x2 = jnp.concatenate(
            [x_ref[...], jnp.zeros((Sp - S, W), jnp.float32)], axis=0
        )
        k2 = jnp.concatenate(
            [k_ref[...], jnp.zeros((C * K, Sp - S), jnp.float32)], axis=1
        )
        H = jnp.dot(k2, x2, preferred_element_type=jnp.float32)
        for c in range(C):
            out_ref[c, :] = jnp.sum(H[c * K : (c + 1) * K, :], axis=0)

    t0 = time.perf_counter()
    outd = np.asarray(
        pl.pallas_call(
            kd, out_shape=jax.ShapeDtypeStruct((C, W), jnp.float32)
        )(jnp.asarray(x), jnp.asarray(kf))
    )
    errd = np.abs(outd - refa) / np.maximum(np.abs(refa), 1)
    print(f"D dot zero-padded K-dim: rel err {errd.max():.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- E: dot + sum over ALL rows (no misaligned slice) -----------------
    def ke(x_ref, k_ref, out_ref):
        H = jnp.dot(k_ref[...], x_ref[...],
                    preferred_element_type=jnp.float32)
        out_ref[0, :] = jnp.sum(H, axis=0)

    t0 = time.perf_counter()
    oute = np.asarray(
        pl.pallas_call(
            ke, out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32)
        )(jnp.asarray(x), jnp.asarray(kf))
    )
    refe = (kf @ x).sum(0, keepdims=True)
    erre = np.abs(oute - refe) / np.maximum(np.abs(refe), 1)
    print(f"E dot all-row sum: rel err {erre.max():.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- F: dot + 8-ALIGNED block slices (Kp=152 zero-padded rows) --------
    Kp = 152
    kfp = np.zeros((C * Kp, S), np.float32)
    for c in range(C):
        kfp[c * Kp : c * Kp + K] = kf[c * K : (c + 1) * K]

    def kf_kernel(x_ref, k_ref, out_ref):
        H = jnp.dot(k_ref[...], x_ref[...],
                    preferred_element_type=jnp.float32)
        for c in range(C):
            out_ref[c, :] = jnp.sum(H[c * Kp : (c + 1) * Kp, :], axis=0)

    t0 = time.perf_counter()
    outf = np.asarray(
        pl.pallas_call(
            kf_kernel, out_shape=jax.ShapeDtypeStruct((C, W), jnp.float32)
        )(jnp.asarray(x), jnp.asarray(kfp))
    )
    errf = np.abs(outf - refa) / np.maximum(np.abs(refa), 1)
    print(f"F dot 8-aligned slices: rel err {errf.max():.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- G: M=128 dot --------------------------------------------------
    def kg(x_ref, k_ref, out_ref):
        H = jnp.dot(k_ref[...], x_ref[...],
                    preferred_element_type=jnp.float32)  # [128, W]
        out_ref[...] = H

    t0 = time.perf_counter()
    outg = np.asarray(
        pl.pallas_call(
            kg, out_shape=jax.ShapeDtypeStruct((128, W), jnp.float32)
        )(jnp.asarray(x), jnp.asarray(kf[:128]))
    )
    refg = kf[:128] @ x
    errg = np.abs(outg - refg) / np.maximum(np.abs(refg), 1)
    print(f"G M=128 dot: rel err {errg.max():.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- H: full H via 3 chunked M<=128 dots ------------------------------
    def kh(x_ref, k_ref, out_ref):
        xs = x_ref[...]
        outs = []
        for m0 in range(0, C * K, 128):
            m1 = min(m0 + 128, C * K)
            outs.append(
                jnp.dot(k_ref[m0:m1, :], xs,
                        preferred_element_type=jnp.float32)
            )
        H = jnp.concatenate(outs, axis=0)
        for c in range(C):
            out_ref[c, :] = jnp.sum(H[c * K : (c + 1) * K, :], axis=0)

    t0 = time.perf_counter()
    outh = np.asarray(
        pl.pallas_call(
            kh, out_shape=jax.ShapeDtypeStruct((C, W), jnp.float32)
        )(jnp.asarray(x), jnp.asarray(kf))
    )
    errh = np.abs(outh - refa) / np.maximum(np.abs(refa), 1)
    print(f"H chunked-M dots: rel err {errh.max():.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- I: full dot at precision=HIGHEST ---------------------------------
    def ki(x_ref, k_ref, out_ref):
        H = jnp.dot(k_ref[...], x_ref[...],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        for c in range(C):
            out_ref[c, :] = jnp.sum(H[c * K : (c + 1) * K, :], axis=0)

    t0 = time.perf_counter()
    outi = np.asarray(
        pl.pallas_call(
            ki, out_shape=jax.ShapeDtypeStruct((C, W), jnp.float32)
        )(jnp.asarray(x), jnp.asarray(kf))
    )
    erri = np.abs(outi - refa) / np.maximum(np.abs(refa), 1)
    print(f"I dot HIGHEST: rel err {erri.max():.2e} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
