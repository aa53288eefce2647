#!/usr/bin/env python
"""Does copy_to_host_async overlap fetch RTTs on axon? And how does fetch
bandwidth scale with size? All probes fetch fresh buffers."""
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


i = [0.0]


from functools import partial


@partial(jax.jit, static_argnums=1)
def mk_mb(v, mb):
    return jnp.full((mb * 256, 1024), v, jnp.float32)


# fetch bandwidth vs size
for mb in (1, 4, 16, 32):
    def one(mb=mb):
        i[0] += 1.0
        return np.asarray(mk_mb(i[0], mb))

    one()
    t = med(one, 3)
    print(f"fresh fetch {mb:3d}MB: {t*1e3:8.1f} ms -> {mb/t:6.1f} MB/s")

# serial vs async 8 x 1MB fetches
@jax.jit
def mk1(v):
    return jnp.full((256, 1024), v, jnp.float32)


def serial8():
    outs = []
    for _ in range(8):
        i[0] += 1.0
        outs.append(np.asarray(mk1(i[0])))
    return outs


def async8():
    bufs = []
    for _ in range(8):
        i[0] += 1.0
        bufs.append(mk1(i[0]))
    for b in bufs:
        b.copy_to_host_async()
    return [np.asarray(b) for b in bufs]


serial8()
print(f"8x1MB serial np.asarray:  {med(serial8, 3)*1e3:8.1f} ms")
try:
    async8()
    print(f"8x1MB copy_to_host_async: {med(async8, 3)*1e3:8.1f} ms")
except Exception as e:  # noqa: BLE001
    print(f"copy_to_host_async failed: {e!r}")

# upload: serial big put vs chunked puts; and put while fetch in flight
up = np.zeros((8 * 256, 1024), np.float32)  # 8MB


def put_sync():
    i[0] += 1.0
    v = jax.device_put(up)
    return np.asarray(jnp.sum(v) + i[0])


put_sync()
print(f"8MB put + scalar fetch:   {med(put_sync, 3)*1e3:8.1f} ms")


# full-duplex: issue async fetch of 8MB, then upload 8MB, then consume
@jax.jit
def mk8(v):
    return jnp.full((8 * 256, 1024), v, jnp.float32)


def duplex():
    i[0] += 1.0
    d = mk8(i[0])
    d.copy_to_host_async()
    v = jax.device_put(up)
    s = jnp.sum(v) + i[0]
    a = np.asarray(d)
    return a, np.asarray(s)


duplex()
print(f"8MB down + 8MB up duplex: {med(duplex, 3)*1e3:8.1f} ms")
