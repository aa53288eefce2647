#!/usr/bin/env python
"""TPU probe for wire v7 (chunk-resident fragment pools) + occ tolerance.

Three questions, answered in ONE process with alternating A/B repeats
(relay throughput swings 10-40x within 30 min — CLAUDE.md):

1. Does run_step_pool produce bitwise-identical output buffers to
   run_step_delta12 on the real TPU (gather + cumsum lowering)?
2. Is the pool wire faster end-to-end on the relay (fewer upload bytes)?
   Timed with the honest methodology (distinct buffers per dispatch,
   np.asarray of real output bytes as the sync, production _pipelined).
3. Is |LL_f32(device) - LL_f64| within the occ exact_tol=2e-3 bound on
   the axon backend (config.py round-4 tolerance change, measured 1.7e-4
   on CPU-XLA)?

Usage: nohup python scripts/probe_pool_tpu.py > /tmp/probe_pool_tpu.log &
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from nucleoatac_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench_e2e import synth_dataset

    from nucleoatac_tpu.config import RunConfig, WindowParams
    from nucleoatac_tpu.core.chunk import ChunkList
    from nucleoatac_tpu.core.pwm import PWM
    from nucleoatac_tpu.io.bam import scan_bam
    from nucleoatac_tpu.models.data import (
        make_delta12_batches,
        make_pool_batches,
        pack_nibble_codes,
        tile_chunks,
    )
    from nucleoatac_tpu.models.engine import DeviceEngine
    from nucleoatac_tpu.models.nuc import SeqCodesProvider
    from nucleoatac_tpu.models.occ import _pipelined, fit_mixture

    print(f"# platform: {jax.devices()[0].platform}", flush=True)
    B = 128
    bam, bed, fa = synth_dataset("/tmp", 1, 400, 2000, 500, seed=7)
    cfg = RunConfig(window=WindowParams(batch=B))
    frags = scan_bam(bam)
    chunks = ChunkList.read(bed, frags.chrom_dict).merge()
    fs, mix = fit_mixture(frags, chunks, cfg)
    eng = DeviceEngine(cfg, mix, fs, pwm=PWM.default())
    tiles = tile_chunks(chunks, cfg.window, cfg.occ, cfg.vmat)
    from nucleoatac_tpu.io.fasta import FastaFile

    seq_provider = SeqCodesProvider(FastaFile(fa), chunks, eng, B)
    print(f"# {len(tiles)} windows, {frags.n_fragments()} fragments",
          flush=True)

    d12_batches = list(make_delta12_batches(frags, tiles, eng.width, B))
    pool_batches = list(make_pool_batches(frags, tiles, eng.width, B))
    nibs_d12 = [
        pack_nibble_codes(seq_provider.rows(b.meta)) for b in d12_batches
    ]
    nibs_pool = [
        pack_nibble_codes(seq_provider.rows(b.meta)) for b in pool_batches
    ]
    d12_bytes = sum(b.buf.nbytes for b in d12_batches) / len(d12_batches)
    seen = set()
    pool_up = 0
    for b in pool_batches:
        pool_up += b.table.nbytes
        if b.pool_id not in seen:
            seen.add(b.pool_id)
            pool_up += b.pool.nbytes
    print(f"# upload/batch: delta12 {d12_bytes/1024:.1f} KB, "
          f"pool {pool_up/len(pool_batches)/1024:.1f} KB "
          f"({len(seen)} groups)", flush=True)

    # ---- 1. bitwise equality on-device (first batch) ------------------
    t0 = time.perf_counter()
    b0 = d12_batches[0]
    out_d = np.asarray(
        eng.run_step_delta12(jnp.asarray(b0.buf), jnp.asarray(nibs_d12[0]))
    )
    print(f"# delta12 first fetch: {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    p0 = pool_batches[0]
    out_p = np.asarray(
        eng.run_step_pool(
            jnp.asarray(p0.pool), jnp.asarray(p0.table),
            jnp.asarray(nibs_pool[0]), p0.emax,
        )
    )
    print(f"# pool first fetch: {time.perf_counter()-t0:.0f}s", flush=True)
    nb = min(len(b0.meta), len(p0.meta))
    same = np.array_equal(out_d[:nb], out_p[:nb])
    print(f"# bitwise equal (first {nb} rows): {same}", flush=True)
    if not same:
        diff = np.flatnonzero((out_d[:nb] != out_p[:nb]).any(axis=1))
        print(f"# differing rows: {diff[:10]}", flush=True)

    # ---- 2. A/B timed loops (alternating) ------------------------------
    def loop_d12():
        def dispatch(i):
            return eng.run_step_delta12(
                jnp.asarray(d12_batches[i].buf), jnp.asarray(nibs_d12[i])
            )

        t0 = time.perf_counter()
        n_w = 0
        for i, out in _pipelined(range(len(d12_batches)), dispatch,
                                 fetch_threads=8):
            np.asarray(out)
            n_w += len(d12_batches[i].meta)
        return n_w / (time.perf_counter() - t0)

    def loop_pool():
        dev = {"id": None, "arr": None}

        def dispatch(i):
            b = pool_batches[i]
            if b.pool_id != dev["id"]:
                dev["id"] = b.pool_id
                dev["arr"] = jnp.asarray(b.pool)
            return eng.run_step_pool(
                dev["arr"], jnp.asarray(b.table), jnp.asarray(nibs_pool[i]),
                b.emax,
            )

        t0 = time.perf_counter()
        n_w = 0
        for i, out in _pipelined(range(len(pool_batches)), dispatch,
                                 fetch_threads=8):
            np.asarray(out)
            n_w += len(pool_batches[i].meta)
        return n_w / (time.perf_counter() - t0)

    best = {"delta12": 0.0, "pool": 0.0}
    for r in range(6):
        name, fn = (("delta12", loop_d12), ("pool", loop_pool))[r % 2]
        wps = fn()
        best[name] = max(best[name], wps)
        print(f"# repeat {r}: {name} {wps:,.0f} w/s", flush=True)
    print(f"RESULT wire A/B best: delta12 {best['delta12']:,.0f} w/s, "
          f"pool {best['pool']:,.0f} w/s", flush=True)

    # ---- 3. occ LL error on this backend -------------------------------
    from nucleoatac_tpu.models.data import make_dense_batches
    from nucleoatac_tpu.ops.occupancy import _ll_and_n

    M32 = jnp.asarray(eng.log_mix)
    M64 = mix.log_mix_table(cfg.occ)
    p0c = cfg.occ
    worst = 0.0
    for k, batch in enumerate(
        make_dense_batches(frags, tiles, eng.width, B,
                           cfg.sizes.lower, cfg.sizes.upper)
    ):
        if k >= 2:
            break
        mat = np.asarray(batch.mats, np.float64)
        ll32 = np.asarray(
            _ll_and_n(jnp.asarray(mat, jnp.float32), M32, p0c.flank)[0],
            np.float64,
        )
        proj = np.einsum("bsw,sg->bwg", mat, M64)
        Bd, Wd, G = proj.shape
        pad = np.zeros((Bd, p0c.flank, G))
        ext = np.concatenate([pad, proj, pad], axis=1)
        c = np.cumsum(ext, axis=1)
        ll64 = c[:, 2 * p0c.flank :] - np.concatenate(
            [np.zeros((Bd, 1, G)), c[:, : Wd - 1]], axis=1
        )
        n = mat.sum(axis=1)
        worst = max(worst, float(np.abs(ll32 - ll64).max()))
    print(f"RESULT max |LL_f32(device) - LL_f64| = {worst:.2e} "
          f"(exact_tol = {p0c.exact_tol})", flush=True)


if __name__ == "__main__":
    main()
