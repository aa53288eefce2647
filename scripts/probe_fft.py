#!/usr/bin/env python
"""FFT-based conv stack probe: correlation via rfft/irfft along W."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nucleoatac_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B, S, W, C, K = 128, 146, 1536, 4, 147
L = 2048  # fft length >= W + K
rng = np.random.default_rng(0)
N = 4
xs = [
    jax.device_put(rng.poisson(0.02, size=(B, S, W)).astype(np.float32))
    for _ in range(N)
]
kerns = rng.standard_normal((C, S, K)).astype(np.float32)
# spectra of kernels, conj for correlation
KF = jax.device_put(np.conj(np.fft.rfft(kerns, n=L, axis=2)).astype(np.complex64))


def med(fn, n=3):
    r = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        r.append(time.perf_counter() - t0)
    return float(np.median(r))


def slope(make_step, label, flops=0):
    f = jax.jit(make_step)

    def run_k(k):
        acc = None
        for i in range(k):
            acc = f(xs[i % N])
        return float(np.asarray(acc))

    run_k(1)
    t1 = med(lambda: run_k(1))
    t9 = med(lambda: run_k(9))
    t = (t9 - t1) / 8
    eq = 2 * B * C * K * S * W  # equivalent direct flops
    print(f"{label:42s} {t*1e3:7.2f} ms  (= {eq/t/1e12:5.1f} TF/s direct-equiv)")
    return t


def fft_corr(x):
    X = jnp.fft.rfft(x, n=L, axis=2)  # [B, S, F]
    Y = jnp.einsum("bsf,csf->bcf", X, KF)  # complex contraction over s
    out = jnp.fft.irfft(Y, n=L, axis=2)  # [B, C, L]
    return out[:, :, : W - K + 1].sum()


slope(fft_corr, "fft corr 4ch (rfft+einsum+irfft)")
slope(lambda x: jnp.fft.rfft(x, n=L, axis=2).real.sum(), "rfft only")


def fft_corr_bf(x):
    X = jnp.fft.rfft(x, n=L, axis=2)
    Y = jnp.einsum("bsf,csf->bcf", X, KF, precision=jax.lax.Precision.HIGHEST)
    out = jnp.fft.irfft(Y, n=L, axis=2)
    return out[:, :, : W - K + 1].sum()


slope(fft_corr_bf, "fft corr 4ch HIGHEST einsum")

# accuracy vs f64 direct
x0 = np.asarray(xs[0][:2], np.float64)
ref = np.zeros((2, C, W - K + 1))
for b in range(2):
    for c in range(C):
        for s in range(S):
            ref[b, c] += np.correlate(x0[b, s], kerns[c, s].astype(np.float64), "valid")
X = jnp.fft.rfft(jnp.asarray(x0, jnp.float32), n=L, axis=2)
Y = jnp.einsum("bsf,csf->bcf", X, KF)
got = np.asarray(jnp.fft.irfft(Y, n=L, axis=2))[:, :, : W - K + 1]
scale = np.abs(ref).max()
print(f"fft max abs err: {np.abs(got - ref).max():.3e} (scale {scale:.1f}) "
      f"rel {np.abs(got - ref).max()/scale:.2e}")
