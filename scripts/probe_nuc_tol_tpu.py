#!/usr/bin/env python
"""Measure |norm_f32(device) - norm_f64| on the axon TPU.

Validates cfg.nuc.exact_tol (2e-3) against the real backend: the occ LL
probe showed TPU bf16x3 error 6.6x the CPU-XLA error (1.13e-3 vs
1.7e-4), so the nuc norm bound needs its own on-TPU measurement. Device
norm comes from the production chained program (nuc_step_delta12_seq_m16
pre-quantization would be ideal, but the u16 step is bounded separately
by qstep — here we fetch the f32 track via nuc_step_delta12_seq_c, the
5-track legacy download) and the oracle is the f64 TileSession kernel.

Usage: nohup python scripts/probe_nuc_tol_tpu.py > /tmp/probe_nuc_tol.log &
"""
from __future__ import annotations

import os
import sys

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
    from nucleoatac_tpu.io.fasta import FastaFile
    from nucleoatac_tpu.models.data import (
        make_delta12_batches,
        pack_nibble_codes,
        tile_chunks,
    )
    from nucleoatac_tpu.models.engine import DeviceEngine
    from nucleoatac_tpu.models.nuc import SeqCodesProvider, chunk_log_bias
    from nucleoatac_tpu.models.nuc_exact import NucRefinisher, TileSession
    from nucleoatac_tpu.models.occ import fit_mixture

    print(f"# platform: {jax.devices()[0].platform}", flush=True)
    B = 16
    bam, bed, fa = synth_dataset("/tmp", 1, 20, 2000, 500, seed=7)
    cfg = RunConfig(window=WindowParams(batch=B))
    frags = scan_bam(bam)
    chunks = ChunkList.read(bed, frags.chrom_dict).merge()
    fs, mix = fit_mixture(frags, chunks, cfg)
    pwm = PWM.default()
    fasta = FastaFile(fa)
    eng = DeviceEngine(cfg, mix, fs, pwm=pwm)
    tiles = tile_chunks(chunks, cfg.window, cfg.occ, cfg.vmat)
    seq_provider = SeqCodesProvider(fasta, chunks, eng, B)
    refin = NucRefinisher(cfg, eng.vmat, eng.size_probs64, pwm, fasta)
    W = eng.width

    worst = 0.0
    worst_core = 0.0
    n_done = 0
    for batch in make_delta12_batches(frags, tiles, W, B):
        nib = pack_nibble_codes(seq_provider.rows(batch.meta))
        out = np.asarray(
            eng.nuc_step_delta12_seq_c(
                jnp.asarray(batch.buf), jnp.asarray(nib)
            ),
            np.float64,
        )  # [B, 5, W] f32 tracks: norm, smooth, signal, lr, fuzz
        for r, t in enumerate(batch.meta):
            m, s = frags.window(t.chrom, t.win_start, t.win_start + W)
            lb = chunk_log_bias(
                fasta, pwm, t.chrom, t.win_start, t.win_start + W
            )
            sess = TileSession(refin, m - t.win_start, s, lb)
            norm64 = sess.norm_track()
            half = refin.K // 2
            sl = slice(half, W - half)
            err = np.abs(out[r, 0, sl] - norm64[sl])
            worst = max(worst, float(err.max()))
            core = slice(eng.halo, eng.halo + eng.core)
            errc = np.abs(out[r, 0, core] - norm64[core])
            worst_core = max(worst_core, float(errc.max()))
        n_done += len(batch.meta)
        if n_done >= 32:
            break
    print(
        f"RESULT max |norm_f32(device) - norm_f64| over {n_done} windows: "
        f"full-footprint span {worst:.2e}, core {worst_core:.2e} "
        f"(nuc exact_tol = {cfg.nuc.exact_tol})",
        flush=True,
    )


if __name__ == "__main__":
    main()
