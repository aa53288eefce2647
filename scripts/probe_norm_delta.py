#!/usr/bin/env python
"""Measure whether the downloaded norm plane could be int8 position-delta
coded (round-3 VERDICT item 5) — ANSWER: NO, refuted.

The item assumed "the smoothed norm track is slowly varying" — true, but
the wire ships the RAW norm precisely so the smooth track costs zero
download bytes (models/nuc.py :: host_smooth recomputes it). The raw
norm jumps by z-scale units per bp wherever a fragment enters/leaves the
template footprint. Measured on the standard synthetic ATAC dataset
(result recorded 2026-08-21, PARITY.md):

    norm range ~[-2.6, 12.3], u16 step 2.3e-4
    |delta| > 127 u16 units (int8 escape):   59.3% of positions
    |delta| > 2047 (12-bit):                  6.3%
    p99 delta = 3,467 units

An escape rate of 59% makes delta-int8 WORSE than the flat u16 plane.
Kept as a runnable probe so the refutation is reproducible.
"""
from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench_e2e import synth_dataset

    from nucleoatac_tpu.io.tabix import TabixReader
    from nucleoatac_tpu.models.pipeline import run_pipeline

    bam, bed, fa = synth_dataset("/tmp", 1, 10, 2000, 500, seed=7)
    d = tempfile.mkdtemp()
    run_pipeline(bam, bed, os.path.join(d, "r"), fasta_path=fa,
                 write_plots=False)
    r = TabixReader(os.path.join(d, "r") + ".nucleoatac_signal.bedgraph.gz")
    vals = []
    for f in r.fetch("chr1", 0, 10**9):
        vals.extend([float(f[3])] * (int(f[2]) - int(f[1])))
    v = np.asarray(vals)
    step = (v.max() - v.min()) / 65535
    units = np.abs(np.diff(v)) / step
    print(f"norm range [{v.min():.2f}, {v.max():.2f}], u16 step {step:.2e}")
    for lim in (127, 255, 2047):
        print(f"escape rate |delta| > {lim} u16 units: "
              f"{(units > lim).mean():.4f}")
    print(f"p99 delta {np.percentile(units, 99):.0f} units, "
          f"max {units.max():.0f}")


if __name__ == "__main__":
    main()
