#!/usr/bin/env python
"""Correctness + device-time of the fused Pallas diag-conv kernel vs XLA.

Timing uses the fori_loop slope method (scripts/probe_devtime.py): the
loop body perturbs its carry each iteration (nothing hoists, nothing
dedupes), the only fetch is one scalar, and the per-iteration time is
the slope between two loop lengths — so the number is device time,
independent of the relay's (volatile) wire throughput.

Run ALONE on the tunnel. Expect a multi-minute first-fetch stall while
the kernel compiles remotely.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn, n1=4, n2=12, reps=3):
    """Best (t(n2)-t(n1))/(n2-n1) over reps; fn(n) must fetch a scalar."""
    best = float("inf")
    fn(2)  # warm/compile both loop lengths' programs
    fn(2)
    for _ in range(reps):
        t0 = time.perf_counter(); fn(n1); t1 = time.perf_counter()
        fn(n2); t2 = time.perf_counter()
        s = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
        if s > 0:
            best = min(best, s)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from nucleoatac_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from nucleoatac_tpu.ops.pallas_diag import diag_conv_pallas
    from nucleoatac_tpu.ops.xcorr import conv_stack_diag

    B, S, W, C, K = 128, 146, 1536, 2, 147
    rng = np.random.default_rng(0)
    x = (rng.random((B, S, W)) * 3).astype(np.float32)
    k2d = rng.standard_normal((C, K, S)).astype(np.float32)
    print(f"device: {jax.devices()[0]}  B={B} S={S} W={W} C={C} K={K}",
          flush=True)

    xd = jnp.asarray(x)
    # --- correctness on device --------------------------------------------
    t0 = time.perf_counter()
    got = np.asarray(diag_conv_pallas(xd, k2d))
    print(f"pallas compile+run+fetch: {time.perf_counter()-t0:.1f}s",
          flush=True)
    ref = np.asarray(conv_stack_diag(xd, jnp.asarray(k2d)))
    # f64 oracle: H64 then diagonal sums
    H64 = np.einsum("ks,bsw->bkw", k2d.reshape(C * K, S).astype(np.float64),
                    x.astype(np.float64)).reshape(B, C, K, W)
    Wo = W - K + 1
    ref64 = np.zeros((B, C, Wo))
    for k in range(K):
        ref64 += H64[:, :, k, k : k + Wo]
    for name, a in (("pallas", got), ("XLA(HIGH)", ref)):
        e = np.abs(a - ref64) / np.maximum(np.abs(ref64), 1.0)
        print(f"max rel err {name} vs f64: {e.max():.2e} "
              f"(mean {e.mean():.2e})", flush=True)
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
    bad = np.unravel_index(err.argmax(), err.shape)
    print(f"max rel err pallas vs XLA(HIGH): {err.max():.2e} at {bad} "
          f"(got {got[bad]:.4f} ref {ref[bad]:.4f} f64 {ref64[bad]:.4f})",
          flush=True)
    if np.abs(got - ref64).max() / np.maximum(np.abs(ref64), 1.0).max() > 5e-4 and (np.abs(got - ref64) / np.maximum(np.abs(ref64), 1.0)).max() > 5e-4:
        print("FAIL: kernel disagrees with the f64 oracle", flush=True)
        return 1

    # --- slope timing ------------------------------------------------------
    flop = 2 * B * C * K * S * W * 2  # 2 stacks' worth when doubled below
    k2dd = jnp.asarray(k2d)

    @partial(jax.jit, static_argnums=1)
    def loop_pallas(x0, n):
        def body(i, carry):
            acc, xx = carry
            xx = xx.at[0, 0, 0].set(acc * 1e-6)
            o = diag_conv_pallas(xx, k2dd)
            return acc + o.sum(), xx
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x0))
        return acc

    @partial(jax.jit, static_argnums=1)
    def loop_xla(x0, n):
        def body(i, carry):
            acc, xx = carry
            xx = xx.at[0, 0, 0].set(acc * 1e-6)
            o = conv_stack_diag(xx, k2dd)
            return acc + o.sum(), xx
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x0))
        return acc

    for name, fn in (("pallas", loop_pallas), ("xla-diag", loop_xla)):
        t = slope(lambda n, f=fn: np.asarray(f(xd, n)))
        one_stack_flop = 2 * C * K * S * W * B
        print(
            f"{name:9s}: {t*1e3:7.2f} ms per [B,{C},{K}]x[B,{S},{W}] stack "
            f"({one_stack_flop/t/1e12:6.1f} TF/s logical)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
