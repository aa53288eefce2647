"""Host data layer: fixed-shape window batching over peak chunks.

The reference partitions peak windows across a multiprocessing pool
(reference:run_occ.py/run_nuc.py pool setup — SURVEY.md §3.3); here peaks
are tiled into fixed cores + halos and packed into regular [B, F] fragment
tensors for batched device execution (DESIGN.md §10). Fragment capacity F
is bucketed to powers of two so jit recompiles at most a handful of times.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from nucleoatac_tpu.config import OccParams, RunConfig, VMatParams, WindowParams
from nucleoatac_tpu.core.chunk import Chunk, ChunkList
from nucleoatac_tpu.io.bam import BamFragments


@dataclass
class TileMeta:
    chunk_id: int
    chrom: str
    core_start: int
    core_end: int
    win_start: int  # genomic position of window column 0 (may be < 0)


@dataclass
class WindowBatch:
    mids: np.ndarray  # [B, F] int32, window-relative midpoints
    sizes: np.ndarray  # [B, F] int32
    valid: np.ndarray  # [B, F] bool
    meta: List[TileMeta]  # length <= B; rows past len(meta) are padding


def tile_chunks(
    chunks: ChunkList, cfg: WindowParams, occ: OccParams, vmat: VMatParams
) -> List[TileMeta]:
    halo = cfg.halo(occ, vmat)
    tiles: List[TileMeta] = []
    for cid, chunk in enumerate(chunks):
        one = ChunkList([chunk]).tile(cfg.core)
        for _, cs, ce in one:
            tiles.append(TileMeta(cid, chunk.chrom, cs, ce, cs - halo))
    return tiles


def _bucket(n: int, minimum: int = 256) -> int:
    f = minimum
    while f < n:
        f *= 2
    return f


def make_batches(
    frags: BamFragments,
    tiles: Sequence[TileMeta],
    width: int,
    batch: int,
) -> Iterator[WindowBatch]:
    """Yields fixed-[B, F] batches; F = power-of-two bucket of the batch's
    max fragment count. Windows select fragments by midpoint in
    [win_start, win_start + width)."""
    for i in range(0, len(tiles), batch):
        group = list(tiles[i : i + batch])
        frag_lists: List[Tuple[np.ndarray, np.ndarray]] = []
        for t in group:
            m, s = frags.window(t.chrom, t.win_start, t.win_start + width)
            frag_lists.append((m - t.win_start, s))
        fmax = max((len(m) for m, _ in frag_lists), default=1)
        F = _bucket(max(fmax, 1))
        B = batch
        mids = np.zeros((B, F), dtype=np.int32)
        sizes = np.zeros((B, F), dtype=np.int32)
        valid = np.zeros((B, F), dtype=bool)
        for r, (m, s) in enumerate(frag_lists):
            mids[r, : len(m)] = m
            sizes[r, : len(s)] = s
            valid[r, : len(m)] = True
        yield WindowBatch(mids, sizes, valid, group)


class ChunkAssembler:
    """Collects per-tile core slices back into per-chunk dense tracks.

    The reference keeps genome order with queue-fed writer processes
    (SURVEY.md §3.3 "ordered result collection"); here tiles arrive in
    deterministic order and chunk tracks complete when all their tiles
    have landed.
    """

    def __init__(self, chunks: ChunkList, track_names: Sequence[str]):
        self.chunks = chunks
        self.names = list(track_names)
        self.tracks: Dict[int, Dict[str, np.ndarray]] = {}
        self.remaining: Dict[int, int] = {}

    def expect(self, tiles: Sequence[TileMeta]) -> None:
        for t in tiles:
            self.remaining[t.chunk_id] = self.remaining.get(t.chunk_id, 0) + 1

    def add(
        self, t: TileMeta, values: Dict[str, np.ndarray], win_start_col: int
    ) -> Iterator[Tuple[int, Chunk, Dict[str, np.ndarray]]]:
        """values: full-width [W] arrays; win_start_col = column of
        t.core_start in the window. Yields (chunk_id, chunk, tracks) for
        chunks that completed."""
        chunk = self.chunks[t.chunk_id]
        if t.chunk_id not in self.tracks:
            self.tracks[t.chunk_id] = {
                n: np.zeros(len(chunk), dtype=np.float64) for n in self.names
            }
        off = t.core_start - chunk.start
        n_core = t.core_end - t.core_start
        for n in self.names:
            self.tracks[t.chunk_id][n][off : off + n_core] = values[n][
                win_start_col : win_start_col + n_core
            ]
        self.remaining[t.chunk_id] -= 1
        if self.remaining[t.chunk_id] == 0:
            yield t.chunk_id, chunk, self.tracks.pop(t.chunk_id)
            del self.remaining[t.chunk_id]
