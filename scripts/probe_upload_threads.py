#!/usr/bin/env python
"""Does the relay's host->device stream scale with concurrent uploads?

Counterpart of probe_parallel_fetch.py (which showed device->host is
per-fetch limited: 8 threads = 31 vs 20 MB/s). After the threaded-fetch
fix the e2e loop's bottleneck moves toward the upload side (~627 KB
delta+nibble per wire-v4 batch), so measure:

  1. async uploads: jnp.asarray x N then one block_until_ready (the
     current dispatch path — device_put is dispatch-async already),
  2. ThreadPoolExecutor uploads with 2/4/8 threads, each thread
     block_until_ready-ing its own array,
  3. threaded uploads + device add (forces the data to be consumed —
     guards against lazy/deferred transfer tricks) synced by a fetch.

Distinct buffers everywhere. Run ALONE on the tunnel.
"""
from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    KB = 627  # ~ one wire-v4 upload (delta frags + nibble codes), B=128
    N = 8

    def fresh(n):
        return [
            rng.integers(0, 255, size=KB * 1024, dtype=np.uint8)
            for _ in range(n)
        ]

    # warm upload + fetch path
    t0 = time.perf_counter()
    x = jnp.asarray(fresh(1)[0])
    x.block_until_ready()
    s = jnp.sum(x.astype(jnp.uint32))
    _ = np.asarray(s)
    print(f"warm: {time.perf_counter()-t0:.1f}s", flush=True)

    # 1. async batch upload (current path)
    ups = fresh(N)
    t0 = time.perf_counter()
    xs = [jnp.asarray(u) for u in ups]
    jax.block_until_ready(xs)
    dt = time.perf_counter() - t0
    print(f"async up    x{N}: {dt*1e3:7.1f} ms  {N*KB/1024/dt:6.1f} MB/s", flush=True)

    # 2. threaded uploads
    for nt in (2, 4, 8):
        ups = fresh(N)

        def up(u):
            a = jnp.asarray(u)
            a.block_until_ready()
            return a

        with ThreadPoolExecutor(nt) as ex:
            t0 = time.perf_counter()
            xs = list(ex.map(up, ups))
            dt = time.perf_counter() - t0
        print(
            f"threads={nt}   x{N}: {dt*1e3:7.1f} ms  {N*KB/1024/dt:6.1f} MB/s",
            flush=True,
        )

    # 3. threaded uploads, consumption-proof: sum each on device, fetch
    #    one scalar per buffer (so the transfer cannot be deferred)
    summ = jax.jit(lambda a: jnp.sum(a.astype(jnp.uint32)))
    _ = np.asarray(summ(jnp.asarray(fresh(1)[0])))  # warm compile
    for nt in (1, 8):
        ups = fresh(N)

        def up_consume(u):
            return np.asarray(summ(jnp.asarray(u)))

        with ThreadPoolExecutor(nt) as ex:
            t0 = time.perf_counter()
            list(ex.map(up_consume, ups))
            dt = time.perf_counter() - t0
        print(
            f"consume t={nt} x{N}: {dt*1e3:7.1f} ms  {N*KB/1024/dt:6.1f} MB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
