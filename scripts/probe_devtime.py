#!/usr/bin/env python
"""Device-stage timing that survives the axon relay's async semantics.

Two relay properties invalidate naive timing loops (and explain round-1's
impossible 'device-resident' numbers, VERDICT r1 weak item 1):
  1. block_until_ready returns before remote execution completes — an op
     that must write a 197 MB output 'finishes' in 0.05 ms, above HBM
     bandwidth.
  2. identical (program, args) dispatches can be deduped server-side.

Methodology here: each stage runs N times inside ONE jitted
lax.fori_loop whose carry feeds every iteration's input from the
previous iteration's output (index-dependent in-place perturbation, so
nothing hoists or dedupes), and the loop result is FETCHED (np.asarray
— the only true sync). Per-iteration time = (T(N2) - T(N1)) / (N2 - N1),
cancelling the fetch RTT and dispatch constants. A null loop (perturb +
scalar read only) calibrates loop overhead.
"""
from __future__ import annotations

import time
from functools import partial

import numpy as np


def slope_time(build, n1=8, n2=32, repeats=3):
    """build(n) -> zero-arg callable returning a device scalar.

    Every call inside build() must dispatch with a FRESH seed argument
    (see loop() below) so no timed call replays a (program, args) pair
    the relay could dedupe. Non-positive slopes (timing noise) are
    rejected; the median of the positive repeats is returned, or NaN if
    none were positive."""
    f1, f2 = build(n1), build(n2)
    np.asarray(f1()), np.asarray(f2())  # compile + warm (fresh seeds)
    slopes = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(f1())
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(f2())
        tb = time.perf_counter() - t0
        slopes.append((tb - ta) / (n2 - n1))
    pos = [s for s in slopes if s > 0]
    return float(np.median(pos)) if pos else float("nan")


def main():
    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_engine
    from nucleoatac_tpu.models.data import (
        encode_delta_fragments,
        pack_nibble_codes,
    )

    B, F = 128, 2048
    cfg, eng = _tiny_engine(core=1024, batch=B)
    W = eng.width
    rng = np.random.default_rng(1)

    mids = np.sort(rng.integers(0, W, size=(B, F)), axis=1).astype(np.int64)
    szs = np.clip(rng.normal(147, 40, size=(B, F)), 1, 250).astype(np.int64)
    db_h = np.zeros((B, F + W // 255 + 1, 2), np.uint8)
    for b in range(B):
        encode_delta_fragments(mids[b], szs[b], db_h, b)
    wp = eng.seq_codes_width()
    nib_h = pack_nibble_codes(rng.integers(0, 4, size=(B, wp)).astype(np.uint8))
    db = jnp.asarray(db_h)
    nib = jnp.asarray(nib_h)
    mat0 = eng._raster_delta(db)
    logb0 = eng._logbias_nib(nib)
    b00 = eng._bias(logb0)
    fo0, bo0 = eng._convs(mat0, b00)
    print(f"B={B} W={W} F={F}", flush=True)

    results = {}

    import itertools

    seed_counter = itertools.count(1)

    def loop(n, body, init):
        # init passes as jit ARGUMENTS: closed-over device arrays would be
        # fetched back and embedded as MLIR constants at trace time (197 MB
        # -> remote-compile HTTP 413; models/engine.py __init__ note).
        # The accumulator is seeded from a per-call varying scalar ARG so
        # no two dispatches are identical (relay dedupe, premise 2).
        @jax.jit
        def run(seed, *init_args):
            out = jax.lax.fori_loop(0, n, body, (*init_args, seed))
            return out[-1]  # accumulator scalar

        return lambda: run(np.float32(next(seed_counter) * 1e-3), *init)

    # null: perturb a big f32 carry + read a scalar (loop overhead floor)
    def null_body(i, c):
        m, acc = c
        m = jax.lax.dynamic_update_index_in_dim(
            m, acc[None, None], 0, axis=0
        ) if False else m.at[0, 0, 0].set(acc)
        return m, m[0, 0, 1] + acc * 0.5

    results["null (carry perturb only)"] = slope_time(
        lambda n: loop(n, null_body, (mat0,))
    )

    def raster_body(i, c):
        d, acc = c
        m = eng._raster_delta_impl(d)
        d = d.at[0, 0, 1].set((acc.astype(jnp.int32) % 199 + 1).astype(jnp.uint8))
        return d, m[0, 0, i % W] + acc * 0.5

    results["raster (delta decode + scatter)"] = slope_time(
        lambda n: loop(n, raster_body, (db,))
    )

    def pwm_body(i, c):
        nb, acc = c
        lb = eng._logbias_nib_impl(nb)
        nb = nb.at[0, 0].set((acc.astype(jnp.int32) % 67).astype(jnp.uint8))
        return nb, lb[0, i % W] + acc * 0.5

    results["pwm bias (nibble codes)"] = slope_time(
        lambda n: loop(n, pwm_body, (nib,))
    )

    def bias_body(i, c):
        lb, acc = c
        bm = eng._bias_impl(lb)
        lb = lb.at[0, 0].set(acc * 1e-6)
        return lb, bm[0, 0, i % W] + acc * 0.5

    results["bias matrix"] = slope_time(
        lambda n: loop(n, bias_body, (logb0,))
    )

    def convs_body(i, c):
        m, bb, acc = c
        fo, bo = eng._convs_impl(m, bb)
        m = m.at[0, 0, 0].set(acc)
        bb = bb.at[0, 0, 0].set(acc * 1e-6)  # no hoisting of the b-side
        return m, bb, fo[0, 0, i % W] + bo[0, 0, i % W] + acc * 0.5

    results["conv stacks (diag-GEMM, HIGH prec)"] = slope_time(
        lambda n: loop(n, convs_body, (mat0, b00,))
    )

    def occ_body(i, c):
        m, acc = c
        o3 = eng._occ_packed2_impl(m)
        m = m.at[0, 0, 0].set(acc)
        return m, o3[0, 0, i % eng.core].astype(jnp.float32) + acc * 0.5

    results["occupancy (packed2)"] = slope_time(
        lambda n: loop(n, occ_body, (mat0,))
    )

    def fin_body(i, c):
        fo, bb, acc = c
        nm = eng._nuc1m_impl(fo, bb)
        fo = fo.at[0, 0, 0].set(acc)
        bb = bb.at[0, 0, 0].set(acc * 1e-6)
        return fo, bb, nm[0, i % eng.core] + acc * 0.5

    results["nuc finish (norm+margin)"] = slope_time(
        lambda n: loop(n, fin_body, (fo0, bo0,))
    )

    def chain_body(i, c):
        d, nb, acc = c
        m = eng._raster_delta_impl(d)
        o3 = eng._occ_packed2_impl(m)
        nm = eng._nuc1m_impl(*eng._convs_impl(m, eng._bias_impl(
            eng._logbias_nib_impl(nb))))
        # production chain includes the u16 quantize stage; packing raw
        # f32 norm would change the pack dtype/bytes (review finding)
        pk = eng._pack_run_impl(o3, eng._u16_impl(nm))
        d = d.at[0, 0, 1].set((acc.astype(jnp.int32) % 199 + 1).astype(jnp.uint8))
        nb = nb.at[0, 0].set((acc.astype(jnp.int32) % 67).astype(jnp.uint8))
        return d, nb, pk[0, i % pk.shape[1]].astype(jnp.float32) + acc * 0.5

    results["FULL chain (raster..pack)"] = slope_time(
        lambda n: loop(n, chain_body, (db, nib,)), n1=4, n2=16
    )

    null = results["null (carry perturb only)"]
    tot_flop_conv = 2 * (2 * cfg.vmat.width) * (cfg.vmat.upper - cfg.vmat.lower) * W * 2 * B
    tot_flop_occ = 2 * (cfg.sizes.upper - cfg.sizes.lower) * W * cfg.occ.grid_size * B
    for k, v in results.items():
        extra = ""
        net = v - null if k != "null (carry perturb only)" else v
        if "conv" in k:
            extra = f" -> {tot_flop_conv/net/1e12:.1f} TF/s logical"
        if "occupancy" in k:
            extra = f" -> {tot_flop_occ/net/1e12:.1f} TF/s logical"
        print(f"{k:40s}: {v*1e3:8.3f} ms (net {net*1e3:8.3f}){extra}",
              flush=True)


if __name__ == "__main__":
    main()
