#!/usr/bin/env python
"""Roofline + per-stage timing at production shapes (VERDICT r1 item 1).

Methodology — valid on the axon relay, whose two properties invalidate
naive loops (probe_devtime.py, __graft_entry__.py): block_until_ready
returns before remote execution completes, and identical (program, args)
dispatches can be deduped server-side. Therefore:

- Per-stage device time uses the SLOPE method: each stage runs N times
  inside one jitted lax.fori_loop whose carry perturbs EVERY carried
  input each iteration (so no stage is loop-invariant and nothing
  hoists), the accumulator is seeded from a per-call varying scalar
  ARGUMENT (so no two dispatches are identical and nothing dedupes), and
  the scalar result is fetched with np.asarray (the only true sync).
  Per-iteration time = (T(N2) - T(N1)) / (N2 - N1), cancelling RTT and
  dispatch constants. Non-positive slopes (timing noise) are rejected.
- Wire probes use DISTINCT buffers per iteration; uploads are synced by
  fetching a dependent scalar, downloads time the FIRST fetch of fresh
  computed arrays (JAX caches the host copy on the Array afterwards).
- The pipelined e2e loop (the number end-to-end runs pay) uses distinct
  delta batches, host C++ encode included, fetching every packed output
  — identical to bench.py's production loop.

Each measurement prints (flushed) as soon as it lands, so a timeout
still yields partial data; compiled loops land in the persistent cache
(utils/compile_cache.py) making reruns cheap.

Usage: python scripts/roofline.py [--batch 128] [--stages raster,occ,...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import itertools
import json
import sys
import time

import numpy as np

_seed_counter = itertools.count(1)


def slope_time(build, n1=8, n2=32, repeats=3):
    """build(n) -> callable(); every call dispatches a fresh-seeded loop
    of n stage iterations and fetches a scalar. Returns median positive
    slope seconds/iteration, or float('nan') if all repeats were
    non-positive (noise)."""
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frags", type=int, default=2048)
    ap.add_argument("--batches", type=int, default=24,
                    help="distinct batches in the pipelined e2e loop")
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--stages",
        default="wire,raster,pwm,bias,convs,occ,finish,chain,pipe",
        help="comma-set of probes to run (partial runs for slow compiles)",
    )
    args = ap.parse_args()
    want = set(args.stages.split(","))

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from nucleoatac_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_engine
    from nucleoatac_tpu.models.data import encode_delta_batch, pack_nibble_codes
    from nucleoatac_tpu.models.occ import _pipelined

    cfg, eng = _tiny_engine(core=1024, batch=args.batch)
    B, F, W = args.batch, args.frags, eng.width
    rng = np.random.default_rng(1)
    wp = eng.seq_codes_width()
    n_entries = F + W // 255 + 1

    def gen_raw(n):
        mids = np.sort(rng.integers(0, W, size=(n, B, F)), axis=2).astype(np.int64)
        szs = np.clip(
            np.concatenate(
                [
                    rng.normal(147, 20, size=(n, B, F // 2)),
                    rng.exponential(45, size=(n, B, F - F // 2)) + 20,
                ],
                axis=2,
            ),
            1, 250,
        ).astype(np.int64)
        return mids, szs

    def encode(mids, szs):
        db = np.zeros((B, n_entries, 2), np.uint8)
        encode_delta_batch(mids, szs, db)
        return db

    mids0, szs0 = gen_raw(1)
    db_h = encode(mids0[0], szs0[0])
    nib_h = pack_nibble_codes(rng.integers(0, 4, size=(B, wp)).astype(np.uint8))
    up_bytes = db_h.nbytes + nib_h.nbytes

    def _t(msg):
        print(f"# warm: {msg} @ {time.perf_counter()-_t0:.1f}s", flush=True)

    _t0 = time.perf_counter()
    db = jnp.asarray(db_h)
    nib = jnp.asarray(nib_h)
    _t("uploaded")
    mat0 = eng._raster_delta(db)
    _t("raster dispatched")
    logb0 = eng._logbias_nib(nib)
    b00 = eng._bias(logb0)
    _t("bias dispatched")
    fo0, bo0 = eng._convs(mat0, b00)
    _t("convs dispatched")
    occ30 = eng._occ_packed3(mat0)
    norm0 = eng._nuc1m(fo0, bo0)
    packed0 = eng._pack_run(occ30, norm0)
    _t("all dispatched")
    np.asarray(packed0)  # true sync: everything above is resident now
    _t("first fetch done")
    down_bytes = packed0.size  # uint8

    rows = []
    report = {"B": B, "W": W, "F": F, "stage_ms": {}}

    def emit(name, ms, note=""):
        rows.append((name, f"{ms*1e3:.2f}", note))
        report["stage_ms"][name] = round(ms * 1e3, 3)
        print(f"| {name} | {ms*1e3:.2f} | {note} |", flush=True)

    print(f"\n### Roofline @ B={B}, W={W}, F={F} (ms per batch)\n", flush=True)
    print("| stage | ms/batch | notes |\n|---|---|---|", flush=True)

    # ---- wire probes (distinct buffers, fetch-synced) -------------------
    t_rtt = t_up = t_down = float("nan")
    if "wire" in want:
        tiny = jax.device_put(np.float32(1.0)) + 0
        np.asarray(tiny)
        t0 = time.perf_counter()
        for _ in range(8):
            np.asarray(tiny)
        t_rtt = (time.perf_counter() - t0) / 8
        emit("RTT floor (resident scalar fetch)", t_rtt)

        @jax.jit
        def up_sum(d, nb):
            return d.astype(jnp.int32).sum() + nb.astype(jnp.int32).sum()

        n_up = 6
        ms, ss = gen_raw(n_up)
        dbs = [encode(ms[i], ss[i]) for i in range(n_up)]
        nibs = [
            pack_nibble_codes(rng.integers(0, 4, size=(B, wp)).astype(np.uint8))
            for _ in range(n_up)
        ]
        np.asarray(up_sum(jnp.asarray(dbs[0]), jnp.asarray(nibs[0])))  # warm
        t0 = time.perf_counter()
        for i in range(n_up):
            np.asarray(up_sum(jnp.asarray(dbs[i]), jnp.asarray(nibs[i])))
        t_up = (time.perf_counter() - t0) / n_up - t_rtt
        emit(
            "host->device upload (delta+nib)", t_up,
            f"{up_bytes/1e3:.0f} KB -> {up_bytes/max(t_up,1e-9)/1e6:.0f} MB/s",
        )

        # download: FIRST fetch of distinct computed outputs
        outs = [
            eng.run_step_delta(jnp.asarray(dbs[i]), jnp.asarray(nibs[i]))
            for i in range(n_up)
        ]
        np.asarray(eng.run_step_delta(db, nib))  # warm path + sync queue
        t0 = time.perf_counter()
        for o in outs:
            np.asarray(o)
        t_down = (time.perf_counter() - t0) / n_up - t_rtt
        emit(
            "device->host download (packed)", t_down,
            f"{down_bytes/1e3:.0f} KB -> "
            f"{down_bytes/max(t_down,1e-9)/1e6:.0f} MB/s",
        )

    # ---- stage slopes ----------------------------------------------------
    def loop(n, body, init):
        # init passes as jit ARGUMENTS: closed-over device arrays would be
        # fetched back and embedded as MLIR constants at every trace
        # (models/engine.py __init__ note). The seed argument varies per
        # call so no two dispatches are identical.
        @jax.jit
        def run(seed, *init_args):
            out = jax.lax.fori_loop(0, n, body, (*init_args, seed))
            return out[-1]

        return lambda: run(np.float32(next(_seed_counter) * 1e-3), *init)

    def null_body(c):
        m, acc = c
        m = m.at[0, 0, 0].set(acc)
        return m, m[0, 0, 1] + acc * 0.5

    t_null = 0.0
    if want & {"raster", "pwm", "bias", "convs", "occ", "finish", "chain"}:
        t_null = slope_time(
            lambda n: loop(
                n, lambda i, c: null_body(c), (mat0,)
            )
        )
        emit("null loop (carry perturb only)", t_null, "overhead floor")

    def stage(name, build, note=""):
        if name.split(" ")[0] not in want and name not in want:
            return float("nan")
        t = slope_time(build)
        net = t - t_null if np.isfinite(t) else t
        emit(name, net, note)
        return net

    def raster_body(i, c):
        d, acc = c
        m = eng._raster_delta_impl(d)
        d = d.at[0, 0, 1].set((acc.astype(jnp.int32) % 199 + 1).astype(jnp.uint8))
        return d, m[0, 0, 0] + acc * 0.5

    stage("raster", lambda n: loop(n, raster_body, (db,)))

    def pwm_body(i, c):
        nb, acc = c
        lb = eng._logbias_nib_impl(nb)
        nb = nb.at[0, 0].set((acc.astype(jnp.int32) % 67).astype(jnp.uint8))
        return nb, lb[0, 0] + acc * 0.5

    stage("pwm", lambda n: loop(n, pwm_body, (nib,)))

    def bias_body(i, c):
        lb, acc = c
        bm = eng._bias_impl(lb)
        lb = lb.at[0, 0].set(acc * 1e-6)
        return lb, bm[0, 0, 0] + acc * 0.5

    stage("bias", lambda n: loop(n, bias_body, (logb0,)))

    K = cfg.vmat.width
    S_nuc = cfg.vmat.upper - cfg.vmat.lower
    S_occ = cfg.sizes.upper - cfg.sizes.lower
    G = cfg.occ.grid_size
    f_conv = 2 * (2 * K) * S_nuc * W * 2 * B  # f2d + b2d einsums per batch
    f_occ = 2 * S_occ * W * G * B

    def convs_body(i, c):
        m, bb, acc = c
        fo, bo = eng._convs_impl(m, bb)
        # perturb BOTH carried inputs so neither conv stack hoists
        m = m.at[0, 0, 0].set(acc)
        bb = bb.at[0, 0, 0].set(acc * 1e-6)
        return m, bb, fo[0, 0, 0] + bo[0, 0, 0] + acc * 0.5

    t_conv = stage("convs", lambda n: loop(n, convs_body, (mat0, b00)))
    if np.isfinite(t_conv):
        tf = f_conv / t_conv / 1e12
        print(f"  - convs: {f_conv/B/1e6:.0f} MFLOP/window -> {tf:.1f} TF/s "
              f"logical = {tf/197:.1%} of v5e bf16 peak", flush=True)
        report["mfu_conv"] = round(tf / 197, 4)

    def occ_body(i, c):
        m, acc = c
        o3 = eng._occ_packed3_impl(m)
        m = m.at[0, 0, 0].set(acc)
        return m, o3[0, 0, 0].astype(jnp.float32) + acc * 0.5

    t_occ = stage("occ", lambda n: loop(n, occ_body, (mat0,)))
    if np.isfinite(t_occ):
        tf = f_occ / t_occ / 1e12
        print(f"  - occ: {f_occ/B/1e6:.0f} MFLOP/window -> {tf:.1f} TF/s "
              f"logical = {tf/197:.1%} of peak", flush=True)
        report["mfu_occ"] = round(tf / 197, 4)

    def fin_body(i, c):
        fo, bo, acc = c
        nm = eng._nuc1m_impl(fo, bo)
        fo = fo.at[0, 0, 0].set(acc)
        bo = bo.at[0, 0, 0].set(acc * 1e-6)
        return fo, bo, nm[0, 0] + acc * 0.5

    stage("finish", lambda n: loop(n, fin_body, (fo0, bo0)))

    def chain_body(i, c):
        d, nb, acc = c
        m = eng._raster_delta_impl(d)
        o3 = eng._occ_packed3_impl(m)
        nm = eng._nuc1m_impl(
            *eng._convs_impl(m, eng._bias_impl(eng._logbias_nib_impl(nb)))
        )
        pk = eng._pack_run_impl(o3, nm)
        d = d.at[0, 0, 1].set((acc.astype(jnp.int32) % 199 + 1).astype(jnp.uint8))
        nb = nb.at[0, 0].set((acc.astype(jnp.int32) % 67).astype(jnp.uint8))
        return d, nb, pk[0, 0].astype(jnp.float32) + acc * 0.5

    if "chain" in want:
        t_chain = slope_time(
            lambda n: loop(n, chain_body, (db, nib)), n1=4, n2=16
        )
        emit("FULL device chain (raster..pack)", t_chain - t_null)

    # ---- production pipelined e2e loop ----------------------------------
    if "pipe" in want:
        n_b = args.batches
        midsL, szsL = gen_raw(n_b)
        nibs = [
            pack_nibble_codes(rng.integers(0, 4, size=(B, wp)).astype(np.uint8))
            for _ in range(n_b)
        ]

        def gen_batches():
            for i in range(n_b):
                yield i, encode(midsL[i], szsL[i])

        def dispatch(item):
            i, d = item
            return eng.run_step_delta(jnp.asarray(d), jnp.asarray(nibs[i]))

        # warm on 2 throwaway distinct batches
        wm, wsz = gen_raw(2)
        for i, out in _pipelined(
            ((i, encode(wm[i], wsz[i])) for i in range(2)),
            lambda it: eng.run_step_delta(
                jnp.asarray(it[1]), jnp.asarray(nibs[it[0]])
            ),
        ):
            np.asarray(out)
        t0 = time.perf_counter()
        for _, out in _pipelined(gen_batches(), dispatch):
            eng.unpack_run(np.asarray(out))
        t_pipe = (time.perf_counter() - t0) / n_b
        emit(
            "pipelined e2e loop (depth 3, encode incl.)", t_pipe,
            f"{B/t_pipe:,.0f} windows/s",
        )
        report["pipe_wps"] = round(B / t_pipe, 1)

    print(json.dumps(report), file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
