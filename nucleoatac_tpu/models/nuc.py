"""`nucleoatac nuc` stage: V-plot template dyad calling.

Rebuild of reference:nucleoatac/run_nuc.py :: run_nuc +
NucleosomeCalling.py :: NucChunk.process (SURVEY.md §4.2): per-chunk Tn5
bias track, batched device xcorr scoring (models/engine.nuc_step), host
peak calling per chunk (cross-tile separation preserved), genome-ordered
writers. Output contract: DESIGN.md §7/§11.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from nucleoatac_tpu.config import RunConfig
from nucleoatac_tpu.core.chunk import Chunk, ChunkList
from nucleoatac_tpu.core.pwm import PWM
from nucleoatac_tpu.io.bam import BamFragments
from nucleoatac_tpu.io.bedgraph import vals_to_intervals
from nucleoatac_tpu.io.fasta import FastaFile
from nucleoatac_tpu.io.tabix import TabixWriter
from nucleoatac_tpu.models.data import (
    ChunkAssembler,
    make_batches,
    make_delta_batches,
    make_dense_batches,
    make_packed_batches,
    pack_nibble_codes,
    tile_chunks,
)
from nucleoatac_tpu.models.engine import DeviceEngine
from nucleoatac_tpu.utils.numerics import greedy_select_fast, local_max_candidates_fast


@dataclass
class NucCall:
    chrom: str
    pos: int
    z: float
    occ: float
    occ_lower: float
    occ_upper: float
    lr: float
    norm_smooth: float
    signal: float
    fuzz: float

    def bed_row(self) -> str:
        return (
            f"{self.chrom}\t{self.pos}\t{self.pos + 1}\t{self.z:.5g}\t"
            f"{self.occ:.5g}\t{self.occ_lower:.5g}\t{self.occ_upper:.5g}\t"
            f"{self.lr:.5g}\t{self.norm_smooth:.5g}\t{self.signal:.5g}\t"
            f"{self.fuzz:.5g}"
        )


@dataclass
class NucStageResult:
    calls: List[NucCall] = field(default_factory=list)
    redundant: List[NucCall] = field(default_factory=list)
    nuc_dist: np.ndarray = field(default_factory=lambda: np.zeros(1001, np.int64))
    tracks: Dict[int, Dict[str, np.ndarray]] = field(default_factory=dict)


def chunk_seq_codes(
    fasta: Optional[FastaFile], chrom: str, lo: int, hi: int
) -> np.ndarray:
    """uint8 base codes (0..3 = ACGT, 4 = N/out-of-genome) over [lo, hi).

    The wire format for on-device PWM bias (ops/pwmseq.py): 4x fewer
    bytes than the f32 log-bias rows it replaces, and the PWM loop moves
    off the host."""
    from nucleoatac_tpu.core.pwm import BASE_INDEX

    n = hi - lo
    out = np.full(n, 4, dtype=np.uint8)
    if fasta is None:
        return out
    a = max(0, lo)
    if a >= hi:
        return out
    seq = fasta.fetch(chrom, a, hi)
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    codes = BASE_INDEX[np.frombuffer(seq, dtype=np.uint8)]
    codes = np.where(codes < 0, 4, codes).astype(np.uint8)
    out[a - lo : a - lo + len(codes)] = codes
    return out


def chunk_log_bias(
    fasta: Optional[FastaFile], pwm: PWM, chrom: str, lo: int, hi: int
) -> np.ndarray:
    """Per-bp log Tn5 bias over [lo, hi); zeros without a FASTA
    (uniform-bias mode, DESIGN.md §5)."""
    n = hi - lo
    if fasta is None:
        return np.zeros(n, dtype=np.float64)
    pad = max(pwm.up, pwm.down)
    s_lo = lo - pad
    seq = fasta.fetch(chrom, max(0, s_lo), hi + pad)
    clip_lo = max(0, s_lo)
    full = np.zeros(hi + pad - s_lo, dtype=np.float64)
    b = pwm.bias_track(seq)
    full[clip_lo - s_lo : clip_lo - s_lo + len(b)] = b
    out = full[lo - s_lo : lo - s_lo + n]
    return out


class NucStage:
    def __init__(
        self,
        cfg: RunConfig,
        engine: DeviceEngine,
        pwm: Optional[PWM] = None,
        fasta: Optional[FastaFile] = None,
    ):
        self.cfg = cfg
        self.engine = engine
        self.pwm = pwm or PWM.default()
        self.fasta = fasta

    def run(
        self,
        frags: BamFragments,
        chunks: ChunkList,
        occ_lookup: Callable[[int, Chunk, int], Tuple[float, float, float]],
        out_prefix: Optional[str] = None,
        keep_tracks: bool = False,
    ) -> NucStageResult:
        """occ_lookup(chunk_id, chunk, genomic_pos) -> (occ, lower, upper)."""
        cfg = self.cfg
        eng = self.engine
        res = NucStageResult()
        writers = {}
        if out_prefix:
            writers = {
                "norm": TabixWriter(f"{out_prefix}.nucleoatac_signal.bedgraph.gz"),
                "smooth": TabixWriter(
                    f"{out_prefix}.nucleoatac_signal.smooth.bedgraph.gz"
                ),
                "pos": TabixWriter(f"{out_prefix}.nucpos.bed.gz"),
                "red": TabixWriter(f"{out_prefix}.nucpos.redundant.bed.gz"),
            }

        tiles = tile_chunks(chunks, cfg.window, cfg.occ, cfg.vmat)
        names = ["norm", "norm_smooth", "signal", "lr", "fuzz"]
        asm = ChunkAssembler(chunks, names)
        asm.expect(tiles)
        halo = eng.halo

        # per-chunk bias caches (chunk extended by halo on both sides)
        bias_cache: Dict[int, np.ndarray] = {}

        import jax.numpy as jnp

        from nucleoatac_tpu.models.occ import _pipelined

        def batch_log_bias(batch):
            n_rows = cfg.window.batch
            logb = np.zeros((n_rows, eng.width), dtype=np.float32)
            for r, t in enumerate(batch.meta):
                cid = t.chunk_id
                chunk = chunks[cid]
                if cid not in bias_cache:
                    bias_cache[cid] = chunk_log_bias(
                        self.fasta, self.pwm, chunk.chrom,
                        chunk.start - halo, chunk.end + halo,
                    )
                cb = bias_cache[cid]
                cb_start = chunk.start - halo
                a = t.win_start - cb_start
                seg = cb[max(0, a) : a + eng.width]
                dst = max(0, -a)
                logb[r, dst : dst + len(seg)] = seg
            return logb

        # per-chunk sequence-code caches (device PWM bias path)
        codes_cache: Dict[int, np.ndarray] = {}

        def batch_seq_codes(batch):
            """[B, W + L - 1] uint8 rows starting at win_start - pwm.up."""
            up = eng.pwm.up
            wp = eng.seq_codes_width()
            codes = np.full((cfg.window.batch, wp), 4, dtype=np.uint8)
            for r, t in enumerate(batch.meta):
                cid = t.chunk_id
                chunk = chunks[cid]
                if cid not in codes_cache:
                    codes_cache[cid] = chunk_seq_codes(
                        self.fasta, chunk.chrom,
                        chunk.start - halo - up,
                        chunk.end + halo + eng.width + eng.pwm.down,
                    )
                cb = codes_cache[cid]
                a = (t.win_start - up) - (chunk.start - halo - up)
                seg = cb[max(0, a) : a + wp]
                dst = max(0, -a)
                codes[r, dst : dst + len(seg)] = seg
            return codes

        # compact download: ONE stacked f32 [B, 5, W] array per batch
        # (norm, norm_smooth, signal, lr, fuzz; engine._nuc5) — the
        # device->host fetch pays a fixed RTT per array on the relay,
        # so one download beats five ~5x
        if cfg.window.transfer == "delta" and eng.pwm is not None:

            def dispatch(batch):
                return eng.nuc_step_delta_seq_c(
                    jnp.asarray(batch.delta),
                    jnp.asarray(pack_nibble_codes(batch_seq_codes(batch))),
                )

            batches = make_delta_batches(frags, tiles, eng.width, cfg.window.batch)
        elif cfg.window.transfer == "delta":

            def dispatch(batch):
                return eng.nuc_step_delta_c(
                    jnp.asarray(batch.delta), jnp.asarray(batch_log_bias(batch))
                )

            batches = make_delta_batches(frags, tiles, eng.width, cfg.window.batch)
        elif cfg.window.transfer == "packed" and eng.pwm is not None:

            def dispatch(batch):
                return eng.nuc_step_packed_seq_c(
                    jnp.asarray(batch.packed), jnp.asarray(batch_seq_codes(batch))
                )

            batches = make_packed_batches(frags, tiles, eng.width, cfg.window.batch)
        elif cfg.window.transfer == "packed":

            def dispatch(batch):
                return eng.nuc_step_packed_c(
                    jnp.asarray(batch.packed), jnp.asarray(batch_log_bias(batch))
                )

            batches = make_packed_batches(frags, tiles, eng.width, cfg.window.batch)
        elif cfg.window.transfer == "frags":

            def dispatch(batch):
                return eng.nuc_step_frags_c(
                    jnp.asarray(batch.mids),
                    jnp.asarray(batch.sizes),
                    jnp.asarray(batch.valid),
                    jnp.asarray(batch_log_bias(batch)),
                )

            batches = make_batches(frags, tiles, eng.width, cfg.window.batch)
        else:

            def dispatch(batch):
                return eng.nuc_step_dense_c(
                    jnp.asarray(batch.mats), jnp.asarray(batch_log_bias(batch))
                )

            batches = make_dense_batches(
                frags, tiles, eng.width, cfg.window.batch,
                cfg.sizes.lower, cfg.sizes.upper,
            )
        for batch, out in _pipelined(batches, dispatch):
            stacked = np.asarray(out, np.float64)  # [B, 5, W]
            arrs = {n: stacked[:, i] for i, n in enumerate(names)}
            for r, t in enumerate(batch.meta):
                col = t.core_start - t.win_start
                vals = {n: arrs[n][r] for n in names}
                for cid, chunk, tracks in asm.add(t, vals, col):
                    bias_cache.pop(cid, None)  # all tiles dispatched; free it
                    codes_cache.pop(cid, None)
                    self._finish_chunk(cid, chunk, tracks, occ_lookup, writers, res)
                    if keep_tracks:
                        res.tracks[cid] = tracks
        for w in writers.values():
            w.close()
        return res

    def _finish_chunk(self, cid, chunk, tracks, occ_lookup, writers, res) -> None:
        cfg = self.cfg
        p = cfg.nuc
        norm = tracks["norm"]
        smooth = tracks["norm_smooth"]
        mask = (norm >= p.min_z) & (tracks["lr"] >= p.min_lr)
        cand = local_max_candidates_fast(smooth, cfg.nuc.nuc_sep // 2, mask)
        cand_idx = np.flatnonzero(cand)
        sel = greedy_select_fast(smooth, cand, p.nuc_sep)

        def mk(i: int) -> NucCall:
            occ, lo, up = occ_lookup(cid, chunk, chunk.start + i)
            return NucCall(
                chunk.chrom, chunk.start + i, float(norm[i]), occ, lo, up,
                float(tracks["lr"][i]), float(smooth[i]),
                float(tracks["signal"][i]), float(tracks["fuzz"][i]),
            )

        calls = [mk(i) for i in sel]
        red = [mk(i) for i in cand_idx]
        res.calls.extend(calls)
        res.redundant.extend(red)
        # adjacent-dyad spacing histogram (reference nuc_dist diagnostics)
        for a, b in zip(sel, sel[1:]):
            d = b - a
            if d < len(res.nuc_dist):
                res.nuc_dist[d] += 1
        if writers:
            for name, key in (("norm", "norm"), ("smooth", "norm_smooth")):
                w = writers[name]
                for a, b, v in vals_to_intervals(chunk.start, tracks[key]):
                    w.add(chunk.chrom, a, b, f"{chunk.chrom}\t{a}\t{b}\t{v}")
            for c in calls:
                writers["pos"].add(c.chrom, c.pos, c.pos + 1, c.bed_row())
            for c in red:
                writers["red"].add(c.chrom, c.pos, c.pos + 1, c.bed_row())
