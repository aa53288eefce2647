#!/usr/bin/env python
"""Isolate the diag-conv einsum cost: raw GEMMs of the same shapes."""
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

B, S, W, C, K = 128, 146, 1536, 2, 147
rng = np.random.default_rng(0)
N = 4
xs = [
    jax.device_put(rng.poisson(0.02, size=(B, S, W)).astype(np.float32))
    for _ in range(N)
]
k2d = jax.device_put(rng.standard_normal((C, K, S)).astype(np.float32))
kflat = jax.device_put(rng.standard_normal((C * K, S)).astype(np.float32))


def med(fn, n=3):
    r = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        r.append(time.perf_counter() - t0)
    return float(np.median(r))


def slope(make_step, label, flops):
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
    print(f"{label:42s} {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")


HI = jax.lax.Precision.HIGH
fl = 2 * B * C * K * S * W

slope(
    lambda x: jnp.einsum("cks,bsw->bckw", k2d, x,
                         preferred_element_type=jnp.float32,
                         precision=HI).sum(),
    "einsum cks,bsw->bckw HIGH", fl,
)
slope(
    lambda x: jnp.einsum("cks,bsw->bckw", k2d, x,
                         preferred_element_type=jnp.float32).sum(),
    "einsum cks,bsw->bckw default(bf16)", fl,
)
slope(
    lambda x: (kflat @ x.transpose(1, 0, 2).reshape(S, B * W)).sum(),
    "GEMM [CK,S]@[S,BW] via transpose default", fl,
)
slope(
    lambda x: jnp.einsum("ws,ks->wk",
                         x.transpose(0, 2, 1).reshape(B * W, S), kflat,
                         preferred_element_type=jnp.float32,
                         precision=HI).sum(),
    "GEMM [BW,S]@[S,CK] HIGH", fl,
)
# pure transpose cost
slope(lambda x: x.transpose(0, 2, 1).sum(), "transpose bsw->bws only", 0.0001)
# conv formulation for reference
kern = jax.device_put(rng.standard_normal((8, S, K)).astype(np.float32))
slope(
    lambda x: jax.lax.conv_general_dilated(
        x, kern, (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32, precision=HI,
    ).sum(),
    "direct conv 8ch HIGH", 2 * B * 8 * S * K * (W - K + 1),
)


# transpose-free batched matmul: RHS x[b] is already [S, W] layout-perfect
slope(
    lambda x: jnp.einsum("ks,bsw->bkw", kflat, x,
                         preferred_element_type=jnp.float32,
                         precision=HI).sum(),
    "einsum ks,bsw->bkw HIGH (kflat [CK,S])", fl,
)
slope(
    lambda x: jnp.einsum("ks,bsw->bkw", kflat, x,
                         preferred_element_type=jnp.float32).sum(),
    "einsum ks,bsw->bkw default", fl,
)
kblk = jax.device_put(np.asarray(kflat)[:128])
slope(
    lambda x: jnp.einsum("ks,bsw->bkw", kblk, x,
                         preferred_element_type=jnp.float32,
                         precision=HI).sum(),
    "einsum ks,bsw->bkw HIGH M=128 block", fl * 128 / (C * K),
)
