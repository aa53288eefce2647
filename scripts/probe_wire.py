#!/usr/bin/env python
"""Wire probe with memoization-proof inputs (distinct buffers per op).

The axon relay dedupes identical (executable, args) dispatches and JAX
caches device->host fetches on the Array object, so every probe here uses
a DISTINCT buffer per iteration. Measures upload and download seconds vs
size, plus concurrent-async fetch scaling.
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # --- upload: distinct arrays each call ---------------------------------
    for kb in [64, 256, 1024, 4096, 16384]:
        n = 6
        arrs = [rng.integers(0, 255, size=kb * 1024, dtype=np.uint8) for _ in range(n)]
        x = jnp.asarray(arrs[0]); x.block_until_ready()
        t0 = time.perf_counter()
        xs = [jnp.asarray(a) for a in arrs]
        jax.block_until_ready(xs)
        dt = (time.perf_counter() - t0) / n
        print(f"up   {kb:6d} KB: {dt*1e3:8.2f} ms  ({kb/1024/dt:7.1f} MB/s)", flush=True)
        del xs

    # --- download: distinct device arrays (computed, uncached) -------------
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def gen(seed, kb):
        return jax.random.randint(
            jax.random.PRNGKey(seed), (kb * 1024,), 0, 255, dtype=jnp.uint8
        )

    for kb in [64, 256, 1024, 4096, 16384]:
        n = 6
        xs = [gen(i, kb) for i in range(n)]
        jax.block_until_ready(xs)
        _ = np.asarray(gen(99, kb))  # warm fetch path at this size
        t0 = time.perf_counter()
        for x in xs:
            _ = np.asarray(x)
        dt = (time.perf_counter() - t0) / n
        print(f"down {kb:6d} KB: {dt*1e3:8.2f} ms  ({kb/1024/dt:7.1f} MB/s)", flush=True)
        del xs

    # --- concurrent async fetches: does parallelism scale throughput? ------
    for par in [1, 4, 16]:
        kb = 512
        xs = [gen(1000 + i, kb) for i in range(par)]
        jax.block_until_ready(xs)
        for x in xs:
            pass
        t0 = time.perf_counter()
        for x in xs:
            x.copy_to_host_async()
        outs = [np.asarray(x) for x in xs]
        dt = time.perf_counter() - t0
        tot = par * kb / 1024
        print(
            f"async x{par:2d} of {kb} KB: {dt*1e3:8.2f} ms total "
            f"({tot/dt:7.1f} MB/s aggregate)", flush=True,
        )
        del xs


if __name__ == "__main__":
    main()
