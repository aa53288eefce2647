"""Fused occ+nuc pass (models/fused.py) must produce byte-identical
output files to the standalone two-pass drivers — it is a wire
optimization, not a semantic change."""
import gzip
import os

from nucleoatac_tpu.config import RunConfig, WindowParams
from nucleoatac_tpu.core.chunk import ChunkList
from nucleoatac_tpu.core.pwm import PWM
from nucleoatac_tpu.io.bam import scan_bam
from nucleoatac_tpu.io.fasta import FastaFile
from nucleoatac_tpu.models.engine import DeviceEngine
from nucleoatac_tpu.models.fused import fused_supported, run_fused
from nucleoatac_tpu.models.nuc import NucStage
from nucleoatac_tpu.models.occ import OccStage, fit_mixture
from nucleoatac_tpu.models.pipeline import occ_lookup_from_tracks
from tests.synth import make_example

FILES = [
    ".occ.bedgraph.gz", ".occ.lower_bound.bedgraph.gz",
    ".occ.upper_bound.bedgraph.gz", ".occpeaks.bed.gz",
    ".nucleoatac_signal.bedgraph.gz", ".nucleoatac_signal.smooth.bedgraph.gz",
    ".nucpos.bed.gz", ".nucpos.redundant.bed.gz",
]


def _rows(prefix, suffix):
    with gzip.open(prefix + suffix, "rt") as fh:
        return fh.read()


def test_fused_equals_two_pass(tmp_path):
    ex = make_example(tmp_path)
    cfg = RunConfig(window=WindowParams(core=256, batch=4))
    frags = scan_bam(ex["bam"])
    chunks = ChunkList.read(ex["bed"], frags.chrom_dict).merge()
    fs, mix = fit_mixture(frags, chunks, cfg)
    pwm = PWM.default()
    fasta = FastaFile(ex["fasta"])
    engine = DeviceEngine(cfg, mix, fs, pwm=pwm)
    assert fused_supported(cfg, engine)

    two = str(tmp_path / "two")
    occ_stage = OccStage(cfg, engine)
    occ_res = occ_stage.run(frags, chunks, mix, fs, two, keep_tracks=True)
    nuc_stage = NucStage(cfg, engine, pwm, fasta)
    nuc_res = nuc_stage.run(
        frags, chunks, occ_lookup_from_tracks(occ_res), two
    )

    one = str(tmp_path / "one")
    occ_f, nuc_f = run_fused(
        cfg, engine, OccStage(cfg, engine), NucStage(cfg, engine, pwm, fasta),
        frags, chunks, mix, fs, one,
    )

    for sfx in FILES:
        assert os.path.exists(one + sfx) and os.path.exists(two + sfx), sfx
        assert _rows(one, sfx) == _rows(two, sfx), sfx

    assert len(occ_f.peaks) == len(occ_res.peaks)
    assert [c.bed_row() for c in nuc_f.calls] == [
        c.bed_row() for c in nuc_res.calls
    ]
