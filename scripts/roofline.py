#!/usr/bin/env python
"""Roofline + per-stage timing at production shapes (VERDICT r1 item 1).

Measures, on the real chip, with block_until_ready on every probe:
  - host<->device wire bandwidth + fixed per-transfer cost (both ways)
  - device-only time of every chained stage of the fused occ+nuc pass
    (inputs device-resident), at the bench shape (B=128, 1024-bp cores)
  - the device-only total of the full chain (run_step_delta)
  - the production pipelined loop (host encode + upload + chained stages
    + packed download, depth-3 multi-buffered) — the number end-to-end
    runs actually pay
  - logical FLOPs/window of the two MXU stages -> % of v5e bf16 peak

Prints one markdown table (for PARITY.md) + one JSON line to stderr.

Usage: python scripts/roofline.py [--batch 128] [--frags 2048] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_loop(fn, iters, repeats=3):
    """Steady-state per-call seconds: loop `iters` dispatches, block once.

    The device executes dispatches serially, so the final block measures
    the true device total; best-of-`repeats` rejects relay noise."""
    import jax

    out = fn()
    jax.block_until_ready(out)  # warm/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frags", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from nucleoatac_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_engine
    from nucleoatac_tpu.models.data import (
        encode_delta_fragments,
        pack_nibble_codes,
    )
    from nucleoatac_tpu.models.occ import _pipelined

    cfg, eng = _tiny_engine(core=1024, batch=args.batch)
    B, F, W = args.batch, args.frags, eng.width
    rng = np.random.default_rng(1)

    # ---- inputs: same distribution as bench.py -------------------------
    mids = np.sort(rng.integers(0, W, size=(B, F)), axis=1).astype(np.int64)
    szs = np.clip(
        np.concatenate(
            [
                rng.normal(147, 20, size=(B, F // 2)),
                rng.exponential(45, size=(B, F - F // 2)) + 20,
            ],
            axis=1,
        ),
        1,
        250,
    ).astype(np.int64)
    db = np.zeros((B, F + W // 255 + 1, 2), np.uint8)
    for b in range(B):
        encode_delta_fragments(mids[b], szs[b], db, b)
    wp = eng.seq_codes_width()
    nib = pack_nibble_codes(rng.integers(0, 4, size=(B, wp)).astype(np.uint8))

    up_bytes = db.nbytes + nib.nbytes

    # ---- wire probes ----------------------------------------------------
    def upload():
        x = jnp.asarray(db)
        y = jnp.asarray(nib)
        jax.block_until_ready((x, y))
        return x, y

    t_up = bench_loop(lambda: tuple(map(jnp.asarray, (db, nib))), args.iters)
    d_db, d_nib = upload()

    # fixed per-transfer cost: a 4-byte upload
    tiny = np.zeros(4, np.uint8)
    t_fix = bench_loop(lambda: jnp.asarray(tiny), args.iters)

    # ---- device-resident stage times ------------------------------------
    mat = eng._raster_delta(d_db)
    b0_in = eng._logbias_nib(d_nib)
    bias = eng._bias(b0_in)
    fo, bo = eng._convs(mat, bias)
    occ3 = eng._occ_packed3(mat)
    norm1m = eng._nuc1m(fo, bo)
    packed = eng._pack_run(occ3, norm1m)
    jax.block_until_ready((mat, bias, fo, bo, occ3, norm1m, packed))
    down_bytes = packed.size  # uint8

    stages = {
        "raster (delta decode + scatter)": lambda: eng._raster_delta(d_db),
        "pwm bias (nibble codes)": lambda: eng._logbias_nib(d_nib),
        "bias matrix": lambda: eng._bias(b0_in),
        "conv stacks (diag-GEMM)": lambda: eng._convs(mat, bias),
        "occupancy (MLE grid)": lambda: eng._occ_packed3(mat),
        "nuc finish (norm+margin)": lambda: eng._nuc1m(fo, bo),
        "pack download buffer": lambda: eng._pack_run(occ3, norm1m),
    }
    t_stage = {k: bench_loop(fn, args.iters) for k, fn in stages.items()}
    t_chain = bench_loop(
        lambda: eng.run_step_delta(d_db, d_nib), args.iters
    )

    # ---- download probe --------------------------------------------------
    t_down = bench_loop(lambda: np.asarray(packed), max(4, args.iters // 2))

    # ---- production pipelined loop (what e2e runs pay) -------------------
    class _Fake:
        def __init__(self, delta):
            self.delta = delta
            self.meta = []

    n_batches = max(12, args.iters)
    batches = [_Fake(db) for _ in range(n_batches)]

    def dispatch(b):
        return eng.run_step_delta(jnp.asarray(b.delta), jnp.asarray(nib))

    # warm
    for _, out in _pipelined(batches[:4], dispatch):
        np.asarray(out)
    best_pipe = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _, out in _pipelined(batches, dispatch):
            np.asarray(out)
        best_pipe = min(best_pipe, (time.perf_counter() - t0) / n_batches)
    pipe_wps = B / best_pipe

    # ---- FLOP model -------------------------------------------------------
    S_occ = cfg.sizes.upper - cfg.sizes.lower  # 251
    S_nuc = cfg.vmat.upper - cfg.vmat.lower  # 146
    K = cfg.vmat.width  # 147
    G = cfg.occ.grid_size  # 101
    f_conv = 2 * (2 * K) * S_nuc * W * 2  # f2d + b2d einsums, per window
    f_occ = 2 * S_occ * W * G  # occupancy projection, per window
    peak = 197e12  # v5e bf16 peak FLOP/s
    mfu_conv = f_conv * B / t_stage["conv stacks (diag-GEMM)"] / peak
    mfu_occ = f_occ * B / t_stage["occupancy (MLE grid)"] / peak

    # ---- report -----------------------------------------------------------
    dev_total = sum(t_stage.values())
    up_bw = up_bytes / max(t_up - t_fix, 1e-9) / 1e6
    down_bw = down_bytes / max(t_down - t_fix, 1e-9) / 1e6
    rows = [
        ("host→device upload (delta+nib)",
         f"{t_up*1e3:.2f}", f"{up_bytes/1e3:.0f} KB → {up_bw:.0f} MB/s"),
        *[(k, f"{v*1e3:.2f}", "") for k, v in t_stage.items()],
        ("device chain total (run_step_delta)", f"{t_chain*1e3:.2f}",
         f"stage sum {dev_total*1e3:.2f} ms"),
        ("device→host download (packed)", f"{t_down*1e3:.2f}",
         f"{down_bytes/1e3:.0f} KB → {down_bw:.0f} MB/s"),
        ("pipelined loop (depth 3, e2e)", f"{best_pipe*1e3:.2f}",
         f"{pipe_wps:,.0f} windows/s"),
    ]
    print(f"\n### Roofline @ B={B}, W={W}, F={F} (ms per batch)\n")
    print("| stage | ms/batch | notes |")
    print("|---|---|---|")
    for name, ms, note in rows:
        print(f"| {name} | {ms} | {note} |")
    print(
        f"\n- fixed per-transfer cost ≈ {t_fix*1e3:.2f} ms; "
        f"wire: up {up_bw:.0f} MB/s, down {down_bw:.0f} MB/s"
    )
    print(
        f"- conv stacks: {f_conv/1e6:.0f} MFLOP/window → "
        f"{f_conv*B/t_stage['conv stacks (diag-GEMM)']/1e12:.1f} TF/s "
        f"logical = {mfu_conv*100:.0f}% of v5e bf16 peak"
    )
    print(
        f"- occupancy: {f_occ/1e6:.0f} MFLOP/window → "
        f"{f_occ*B/t_stage['occupancy (MLE grid)']/1e12:.1f} TF/s "
        f"logical = {mfu_occ*100:.0f}% of peak"
    )
    print(
        f"- e2e floor check: upload {up_bytes/B:.0f} B/window + download "
        f"{down_bytes/B:.0f} B/window"
    )
    print(
        json.dumps(
            {
                "B": B, "W": W, "F": F,
                "t_up_ms": round(t_up * 1e3, 3),
                "t_down_ms": round(t_down * 1e3, 3),
                "t_fix_ms": round(t_fix * 1e3, 3),
                "stage_ms": {k: round(v * 1e3, 3) for k, v in t_stage.items()},
                "t_chain_ms": round(t_chain * 1e3, 3),
                "pipe_ms": round(best_pipe * 1e3, 3),
                "pipe_wps": round(pipe_wps, 1),
                "up_MBps": round(up_bw, 1),
                "down_MBps": round(down_bw, 1),
                "mfu_conv": round(mfu_conv, 4),
                "mfu_occ": round(mfu_occ, 4),
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
