#!/usr/bin/env python
"""Roofline + per-stage timing at production shapes (VERDICT r1 item 1).

Methodology — valid on the axon relay, whose properties invalidate naive
loops (probe_devtime.py, __graft_entry__.py): block_until_ready returns
before remote execution completes; identical (program, args) dispatches
can be deduped server-side; JAX caches a fetched host copy on the Array;
and a fresh process pays a one-time ~6-minute stall on its FIRST result
fetch (measured below as "warm: first fetch"). Therefore:

- Per-stage device time uses a DISPATCH-SLOPE method: run(k) enqueues k
  iterations of [perturb input with a fresh seed -> production stage
  program -> full on-device sum -> accumulate], then fetches the single
  scalar (np.asarray — the only true sync). The full sums mean XLA
  cannot prune work (a constant-index slice of a conv output CAN be
  simplified into a single dot — measured: it collapses fori_loop-based
  slopes to noise); the fresh seeds mean no dispatch can be deduped.
  Per-iteration time = (T(k2) - T(k1)) / (k2 - k1), cancelling the fetch
  RTT and dispatch constants. The stage programs are the production
  jitted stages themselves (models/engine.py), so compiles come from the
  persistent cache; only tiny perturb/reduce helpers compile anew.
- Wire probes use DISTINCT buffers per iteration: uploads are synced by
  fetching a dependent scalar; RTT fetches a distinct computed scalar
  each time; downloads time the FIRST fetch of fresh computed outputs.
- The pipelined e2e loop (the number end-to-end runs pay) uses distinct
  delta batches, host C++ encode included, fetching every packed output
  — identical to bench.py's production loop.

Each measurement prints (flushed) as soon as it lands, so a timeout
still yields partial data.

Usage: python scripts/roofline.py [--batch 128] [--stages wire,stage,chain,pipe]
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_seed = itertools.count(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frags", type=int, default=2048)
    ap.add_argument("--batches", type=int, default=24,
                    help="distinct batches in the pipelined e2e loop")
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--stages", default="wire,stage,chain,pipe",
        help="comma-set of probe groups (partial runs for slow compiles)",
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
    mat0 = eng._raster_delta(db)
    logb0 = eng._logbias_nib(nib)
    b00 = eng._bias(logb0)
    fo0, bo0 = eng._convs(mat0, b00)
    occ20 = eng._occ_packed2(mat0)
    norm0 = eng._nuc1m(fo0, bo0)
    # u16-quantize BEFORE packing — _pack_run's production input is the
    # uint8 _u16 output; feeding raw f32 norm silently promotes the
    # whole packed buffer to f32 and inflates every download-bytes
    # figure ~2.9x (round-3 review finding)
    packed0 = eng._pack_run(occ20, eng._u16(norm0))
    _t("all dispatched")
    np.asarray(packed0)  # true sync (first fetch pays the process stall)
    _t("first fetch done")
    down_bytes = packed0.size  # uint8

    report = {"B": B, "W": W, "F": F, "stage_ms": {}}

    def emit(name, ms, note=""):
        report["stage_ms"][name] = round(ms * 1e3, 3)
        print(f"| {name} | {ms*1e3:.2f} | {note} |", flush=True)

    print(f"\n### Roofline @ B={B}, W={W}, F={F} (ms per batch)\n", flush=True)
    print("| stage | ms/batch | notes |\n|---|---|---|", flush=True)

    # ---- tiny helpers (the only new compiles) ---------------------------
    bump = jax.jit(lambda s: s * 1.000001 + 1.0)
    pert_db = jax.jit(lambda d, s: d.at[0, 0, 1].set(s))
    pert_u8 = jax.jit(lambda x, s: x.at[0, 0].set(s))
    pert_f = jax.jit(lambda x, s: x.at[0, 0].set(s))
    pert_f3 = jax.jit(lambda x, s: x.at[0, 0, 0].set(s))
    r_f = jax.jit(lambda x: x.astype(jnp.float32).sum())
    r_2 = jax.jit(lambda a, b: a.astype(jnp.float32).sum()
                  + b.astype(jnp.float32).sum())

    def s_u8():
        return np.uint8(next(_seed) % 199 + 1)

    def s_f():
        return np.float32(next(_seed) * 1e-3)

    # ---- wire probes (distinct buffers, fetch-synced) -------------------
    t_rtt = float("nan")
    if "wire" in want:
        np.asarray(bump(s_f()))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(8):
            np.asarray(bump(s_f()))  # distinct computed scalar each time
        t_rtt = (time.perf_counter() - t0) / 8
        emit("RTT floor (distinct scalar fetch)", t_rtt)

        @jax.jit
        def up_sum(d, nb):
            return d.astype(jnp.int32).sum() + nb.astype(jnp.int32).sum()

        n_up = 6
        ms_, ss_ = gen_raw(n_up)
        dbs = [encode(ms_[i], ss_[i]) for i in range(n_up)]
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
        report["up_MBps"] = round(up_bytes / max(t_up, 1e-9) / 1e6, 1)

        # download: FIRST fetch of distinct computed outputs
        outs = [
            eng.run_step_delta(jnp.asarray(dbs[i]), jnp.asarray(nibs[i]))
            for i in range(n_up)
        ]
        np.asarray(eng.run_step_delta(db, nib))  # sync the queue
        t0 = time.perf_counter()
        for o in outs:
            np.asarray(o)
        t_down = (time.perf_counter() - t0) / n_up - t_rtt
        emit(
            "device->host download (packed)", t_down,
            f"{down_bytes/1e3:.0f} KB -> "
            f"{down_bytes/max(t_down,1e-9)/1e6:.0f} MB/s",
        )
        report["down_MBps"] = round(down_bytes / max(t_down, 1e-9) / 1e6, 1)

    # ---- dispatch-slope stage timing ------------------------------------
    def dispatch_slope(make_scalar, k1, k2, repeats):
        """make_scalar() -> device f32 scalar for ONE fresh-seeded stage
        iteration. Returns median positive (T(k2)-T(k1))/(k2-k1)."""
        def run(k):
            acc = make_scalar()
            for _ in range(k - 1):
                acc = jnp.add(acc, make_scalar())
            return np.asarray(acc)

        run(2)  # warm the add chain
        slopes = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run(k1)
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(k2)
            tb = time.perf_counter() - t0
            slopes.append((tb - ta) / (k2 - k1))
        pos = [s for s in slopes if s > 0]
        return float(np.median(pos)) if pos else float("nan")

    K = cfg.vmat.width
    S_nuc = cfg.vmat.upper - cfg.vmat.lower
    S_occ = cfg.sizes.upper - cfg.sizes.lower
    G = cfg.occ.grid_size
    f_conv = 2 * (2 * K) * S_nuc * W * 2 * B  # f2d + b2d einsums per batch
    f_occ = 2 * S_occ * W * G * B

    if "stage" in want:
        t = dispatch_slope(
            lambda: r_f(eng._raster_delta(pert_db(db, s_u8()))),
            args.k1, args.k2, args.repeats,
        )
        emit("raster (delta decode + scatter)", t)

        t = dispatch_slope(
            lambda: r_f(eng._logbias_nib(pert_u8(nib, s_u8()))),
            args.k1, args.k2, args.repeats,
        )
        emit("pwm bias (nibble codes)", t)

        t = dispatch_slope(
            lambda: r_f(eng._bias(pert_f(logb0, s_f()))),
            args.k1, args.k2, args.repeats,
        )
        emit("bias matrix", t)

        t = dispatch_slope(
            lambda: r_2(*eng._convs(pert_f3(mat0, s_f()),
                                    pert_f3(b00, s_f()))),
            args.k1, args.k2, args.repeats,
        )
        emit("conv stacks (diag-GEMM)", t,
             f"{f_conv/B/1e6:.0f} MFLOP/window")
        if np.isfinite(t):
            tf = f_conv / t / 1e12
            print(f"  - convs: {tf:.1f} TF/s logical = {tf/197:.1%} of "
                  f"v5e bf16 peak", flush=True)
            report["mfu_conv"] = round(tf / 197, 4)

        t = dispatch_slope(
            lambda: r_f(eng._occ_packed2(pert_f3(mat0, s_f()))),
            args.k1, args.k2, args.repeats,
        )
        emit("occupancy (MLE grid, packed2)", t,
             f"{f_occ/B/1e6:.0f} MFLOP/window")
        if np.isfinite(t):
            tf = f_occ / t / 1e12
            print(f"  - occ: {tf:.1f} TF/s logical = {tf/197:.1%} of peak",
                  flush=True)
            report["mfu_occ"] = round(tf / 197, 4)

        t = dispatch_slope(
            lambda: r_f(eng._nuc1m(pert_f3(fo0, s_f()),
                                   pert_f3(bo0, s_f()))),
            args.k1, args.k2, args.repeats,
        )
        emit("nuc finish (norm+margin)", t)

    if "chain" in want:
        t_chain = dispatch_slope(
            lambda: r_f(eng.run_step_delta(pert_db(db, s_u8()),
                                           pert_u8(nib, s_u8()))),
            args.k1, args.k2, args.repeats,
        )
        emit("FULL device chain (raster..pack)", t_chain,
             "all 7 chained dispatches, device-resident I/O")

    # ---- production pipelined e2e loop ----------------------------------
    if "pipe" in want:
        n_b = args.batches
        midsL, szsL = gen_raw(n_b)
        nibs_p = [
            pack_nibble_codes(rng.integers(0, 4, size=(B, wp)).astype(np.uint8))
            for _ in range(n_b)
        ]

        def gen_batches():
            for i in range(n_b):
                yield i, encode(midsL[i], szsL[i])

        def dispatch(item):
            i, d = item
            return eng.run_step_delta(jnp.asarray(d), jnp.asarray(nibs_p[i]))

        wm, wsz = gen_raw(2)
        for i, out in _pipelined(
            ((i, encode(wm[i], wsz[i])) for i in range(2)),
            lambda it: eng.run_step_delta(
                jnp.asarray(it[1]), jnp.asarray(nibs_p[it[0]])
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
