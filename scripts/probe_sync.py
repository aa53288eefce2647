#!/usr/bin/env python
"""Probe axon relay dispatch/sync semantics: is enqueue-N-sync-once valid?

Tests the conv stack at B=128 under four timing disciplines:
  a) same input, enqueue N, block last
  b) same input, block every iteration
  c) distinct pre-uploaded inputs, enqueue N, block last
  d) distinct inputs, block every iteration
  e) chained dependent calls (out feeds next), block last
If (a) << (c), the relay dedupes identical executions; if (a) << (b),
block_until_ready on the last output does not cover earlier work.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from nucleoatac_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from __graft_entry__ import _tiny_engine  # noqa: E402

cfg, eng = _tiny_engine(core=1024, batch=128)
B, W = 128, eng.width
S = cfg.sizes.upper - cfg.sizes.lower
rng = np.random.default_rng(0)
N = 10

mats = [
    jax.device_put(rng.poisson(0.02, size=(B, S, W)).astype(np.float32))
    for _ in range(N)
]
logb = jax.device_put((0.3 * rng.standard_normal((B, W))).astype(np.float32))
jax.block_until_ready((mats, logb))
b0 = eng._bias(logb)
jax.block_until_ready(b0)

f = lambda m: eng._convs(m, b0)  # noqa: E731
out = f(mats[0])
jax.block_until_ready(out)


def t(label, fn):
    t0 = time.perf_counter()
    fn()
    dt = (time.perf_counter() - t0) / N
    print(f"{label:55s} {dt*1e3:9.3f} ms/iter")
    return dt


def a():
    o = None
    for _ in range(N):
        o = f(mats[0])
    jax.block_until_ready(o)


def b():
    for _ in range(N):
        jax.block_until_ready(f(mats[0]))


def c():
    o = None
    for i in range(N):
        o = f(mats[i])
    jax.block_until_ready(o)


def d():
    for i in range(N):
        jax.block_until_ready(f(mats[i]))


def e():
    m = mats[0]
    o = None
    for _ in range(N):
        o = f(m)
        m = m + 0 * o[0][:, :1, :1]  # force dependence
    jax.block_until_ready(o)


for label, fn in [
    ("a) same input, enqueue N, block last", a),
    ("b) same input, block each", b),
    ("c) distinct inputs, enqueue N, block last", c),
    ("d) distinct inputs, block each", d),
]:
    fn()  # warm
    t(label, fn)
