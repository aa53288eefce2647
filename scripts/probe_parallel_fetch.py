#!/usr/bin/env python
"""Can the relay wire go faster than one serial fetch stream?

Round-3 roofline: the e2e loop is download-bound at ~25 MB/s. This probe
asks whether that 25 MB/s is a per-stream limit (TCP window / relay
serialization) or a link limit, by comparing:

  1. serial fetches of distinct buffers (the roofline baseline),
  2. copy_to_host_async prefetch then serial np.asarray (the _pipelined
     pattern),
  3. ThreadPoolExecutor fetches with 2/4/8 threads (true host-side
     concurrency — only wins if the relay client multiplexes),
  4. upload from one thread while downloading from another (duplex test:
     the v3 roofline *inferred* full duplex from e2e ~= download; this
     measures it directly).

All buffers are distinct (dedupe-proof); sync is np.asarray of real
bytes (probe_devtime.py relay properties). Run ALONE on the tunnel.
"""
from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(0)

    @partial(jax.jit, static_argnums=1)
    def gen(seed, kb):
        return jax.random.randint(
            jax.random.PRNGKey(seed), (kb * 1024,), 0, 255, dtype=jnp.uint8
        )

    KB = 712  # ~ one wire-v4 batch download (B=128, core=1024)
    N = 8

    # warm: compile gen at this size + first-fetch stall
    t0 = time.perf_counter()
    _ = np.asarray(gen(9999, KB))
    print(f"warm fetch: {time.perf_counter()-t0:.1f}s", flush=True)

    def fresh(n, base):
        xs = [gen(base + i, KB) for i in range(n)]
        jax.block_until_ready(xs)
        return xs

    # 1. serial
    xs = fresh(N, 0)
    t0 = time.perf_counter()
    for x in xs:
        np.asarray(x)
    dt = time.perf_counter() - t0
    print(f"serial      x{N}: {dt*1e3:7.1f} ms  {N*KB/1024/dt:6.1f} MB/s", flush=True)

    # 2. async prefetch then fetch
    xs = fresh(N, 100)
    t0 = time.perf_counter()
    for x in xs:
        x.copy_to_host_async()
    for x in xs:
        np.asarray(x)
    dt = time.perf_counter() - t0
    print(f"async       x{N}: {dt*1e3:7.1f} ms  {N*KB/1024/dt:6.1f} MB/s", flush=True)

    # 3. threaded
    for nt in (2, 4, 8):
        xs = fresh(N, 200 + 100 * nt)
        with ThreadPoolExecutor(nt) as ex:
            t0 = time.perf_counter()
            list(ex.map(np.asarray, xs))
            dt = time.perf_counter() - t0
        print(
            f"threads={nt}  x{N}: {dt*1e3:7.1f} ms  {N*KB/1024/dt:6.1f} MB/s",
            flush=True,
        )

    # 4. duplex: upload thread + download thread simultaneously
    ups = [rng.integers(0, 255, size=KB * 1024, dtype=np.uint8) for _ in range(N)]
    xs = fresh(N, 900)
    jnp.asarray(ups[0]).block_until_ready()  # warm upload path

    def up_all():
        t0 = time.perf_counter()
        ys = [jnp.asarray(u) for u in ups]
        jax.block_until_ready(ys)
        return time.perf_counter() - t0

    def down_all():
        t0 = time.perf_counter()
        for x in xs:
            np.asarray(x)
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(2) as ex:
        fu = ex.submit(up_all)
        fd = ex.submit(down_all)
        tu, td = fu.result(), fd.result()
    tot = time.perf_counter() - t0
    print(
        f"duplex: up {tu*1e3:.1f} ms, down {td*1e3:.1f} ms, "
        f"wall {tot*1e3:.1f} ms (full duplex if wall ~= max, "
        f"half if ~= sum)", flush=True,
    )


if __name__ == "__main__":
    main()
