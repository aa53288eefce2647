#!/usr/bin/env python
"""Characterize the per-relay-op fixed cost and what actually serializes.

Every probe fetches FRESH bytes (new buffers) so host-side result caching
cannot fake the numbers.
"""
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


def med(fn, n=5):
    r = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        r.append(time.perf_counter() - t0)
    return float(np.median(r))


x = jax.device_put(np.float32(3.0))


@jax.jit
def bump(v, i):
    return v + i


np.asarray(bump(x, 1.0))

# RTT: fetch a FRESH scalar each time
i = [0.0]


def fresh_fetch():
    i[0] += 1.0
    return np.asarray(bump(x, i[0]))


t_rtt = med(fresh_fetch, 9)
print(f"dispatch+fetch fresh scalar:        {t_rtt*1e3:8.2f} ms")

# k dispatches then one fresh fetch: per-dispatch marginal cost


def k_dispatch(k):
    v = x
    for _ in range(k):
        i[0] += 1.0
        v = bump(v, i[0])
    return np.asarray(v)


k_dispatch(1)
t1 = med(lambda: k_dispatch(1), 5)
t21 = med(lambda: k_dispatch(21), 5)
print(f"marginal cost per tiny dispatch:    {(t21-t1)/20*1e3:8.2f} ms")

# upload marginal cost: k device_puts of 512KB then dependent fetch
bufs = [np.full((128, 1024), float(j), np.float32) for j in range(24)]


@jax.jit
def s_all(*vs):
    return sum(v.sum() for v in vs)


def k_put(k):
    i[0] += 1.0
    vs = [jax.device_put(bufs[j]) for j in range(k)]
    return np.asarray(s_all(*vs) + i[0])


k_put(1)
t1 = med(lambda: k_put(1), 5)
t9 = med(lambda: k_put(9), 5)
print(f"marginal cost per 512KB put:        {(t9-t1)/8*1e3:8.2f} ms "
      f"-> {0.5/max((t9-t1)/8,1e-9):6.1f} MB/s")

# one big put vs many small: 8MB in 1 vs in 16 chunks
big = np.zeros((2048, 1024), np.float32)


def one_big():
    i[0] += 1.0
    return np.asarray(jnp.sum(jax.device_put(big)) + i[0])


one_big()
t_big = med(one_big, 5)
print(f"8MB single put+sum+fetch:           {t_big*1e3:8.2f} ms "
      f"-> {8/max(t_big-t_rtt,1e-9):6.1f} MB/s")

# download marginal: fetch k FRESH 512KB buffers
@jax.jit
def mk(v):
    return jnp.full((128, 1024), v, jnp.float32)


def k_fetch(k):
    outs = []
    for _ in range(k):
        i[0] += 1.0
        outs.append(mk(i[0]))
    return [np.asarray(o) for o in outs]


k_fetch(1)
t1 = med(lambda: k_fetch(1), 5)
t9 = med(lambda: k_fetch(9), 5)
print(f"marginal cost per fresh 512KB fetch:{(t9-t1)/8*1e3:8.2f} ms "
      f"-> {0.5/max((t9-t1)/8,1e-9):6.1f} MB/s")


@jax.jit
def mkbig(v):
    return jnp.full((2048, 1024), v, jnp.float32)


def big_fetch():
    i[0] += 1.0
    return np.asarray(mkbig(i[0]))


big_fetch()
t_bigf = med(big_fetch, 5)
print(f"8MB single fresh fetch:             {t_bigf*1e3:8.2f} ms "
      f"-> {8/max(t_bigf-t_rtt,1e-9):6.1f} MB/s")
