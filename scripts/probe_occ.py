#!/usr/bin/env python
"""Occupancy stage layout probes: einsum orientation + sliding-sum forms."""
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

B, S, W, G, FL = 128, 251, 1536, 101, 60
rng = np.random.default_rng(0)
N = 4
xs = [
    jax.device_put(rng.poisson(0.02, size=(B, S, W)).astype(np.float32))
    for _ in range(N)
]
M = jax.device_put(rng.standard_normal((S, G)).astype(np.float32))
MT = jax.device_put(np.asarray(M).T.copy())
HI = jax.lax.Precision.HIGH


def med(fn, n=3):
    r = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        r.append(time.perf_counter() - t0)
    return float(np.median(r))


def slope(make_step, label):
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
    print(f"{label:52s} {t*1e3:7.2f} ms")


def sw_old(x):  # [B, W, G] layout, reduce_window over dim1
    proj = jnp.einsum("bsw,sg->bwg", x, M,
                      preferred_element_type=jnp.float32, precision=HI)
    ll = jax.lax.reduce_window(
        proj, jnp.float32(0), jax.lax.add,
        (1, 2 * FL + 1, 1), (1, 1, 1), ((0, 0), (FL, FL), (0, 0)),
    )
    return ll.sum()


def sw_gbw(x):  # [B, G, W] layout, reduce_window over lanes
    proj = jnp.einsum("gs,bsw->bgw", MT, x,
                      preferred_element_type=jnp.float32, precision=HI)
    ll = jax.lax.reduce_window(
        proj, jnp.float32(0), jax.lax.add,
        (1, 1, 2 * FL + 1), (1, 1, 1), ((0, 0), (0, 0), (FL, FL)),
    )
    return ll.sum()


def sw_gbw_2level(x):  # 121 = 11 x 11 two-level sliding sum
    proj = jnp.einsum("gs,bsw->bgw", MT, x,
                      preferred_element_type=jnp.float32, precision=HI)
    t = jax.lax.reduce_window(
        proj, jnp.float32(0), jax.lax.add,
        (1, 1, 11), (1, 1, 1), ((0, 0), (0, 0), (5, 5)),
    )
    ll = jax.lax.reduce_window(
        t, jnp.float32(0), jax.lax.add,
        (1, 1, 11), (1, 1, 1), ((0, 0), (0, 0), (55, 55)),
        window_dilation=(1, 1, 11),
    )
    return ll.sum()


def proj_only(x):
    return jnp.einsum("gs,bsw->bgw", MT, x,
                      preferred_element_type=jnp.float32, precision=HI).sum()


def proj_old(x):
    return jnp.einsum("bsw,sg->bwg", x, M,
                      preferred_element_type=jnp.float32, precision=HI).sum()


slope(proj_old, "einsum bsw,sg->bwg (old layout)")
slope(proj_only, "einsum gs,bsw->bgw (transpose-free)")
slope(sw_old, "old: bwg + reduce_window dim1")
slope(sw_gbw, "bgw + reduce_window lanes 121")
slope(sw_gbw_2level, "bgw + two-level 11x11 dilated")

# equivalence check
x = xs[0][:2]
a = jax.jit(lambda x: jax.lax.reduce_window(
    jnp.einsum("bsw,sg->bwg", x, M, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST),
    jnp.float32(0), jax.lax.add, (1, 2 * FL + 1, 1), (1, 1, 1),
    ((0, 0), (FL, FL), (0, 0))))(x)
b = jax.jit(lambda x: jax.lax.reduce_window(
    jnp.einsum("gs,bsw->bgw", MT, x, preferred_element_type=jnp.float32,
               precision=jax.lax.Precision.HIGHEST),
    jnp.float32(0), jax.lax.add, (1, 1, 11), (1, 1, 1),
    ((0, 0), (0, 0), (5, 5))))(x)
b2 = jax.jit(lambda t: jax.lax.reduce_window(
    t, jnp.float32(0), jax.lax.add, (1, 1, 11), (1, 1, 1),
    ((0, 0), (0, 0), (55, 55)), window_dilation=(1, 1, 11)))(b)
d = np.abs(np.asarray(a) - np.transpose(np.asarray(b2), (0, 2, 1)))
print(f"two-level vs old max abs diff: {d.max():.3e} (scale {np.abs(np.asarray(a)).max():.1f})")
