"""Tabix (TBI) index builder + BGZF text writing (no pysam/htslib).

Replaces reference use of pysam.tabix_compress / tabix_index
(SURVEY.md §3.4 item 2). ``write_indexed`` streams records through a
BGZFWriter, tracking virtual offsets, and emits a `.tbi` with the
standard binning (BAI/CSI 5-level, 14-bit min shift) + 16kb linear index;
zero-based half-open BED preset.
"""
from __future__ import annotations

import struct
from typing import Dict, Iterable, List, Sequence, Tuple

from nucleoatac_tpu.io.bgzf import BGZFWriter


def reg2bin(beg: int, end: int) -> int:
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


class TabixWriter:
    """Writes sorted (chrom, start, end, line) records to `<path>` (BGZF)
    and `<path>.tbi`. Records must arrive grouped by chromosome and sorted
    by start within each."""

    def __init__(self, path: str, preset_flags: int = 0x10000):
        self.path = path
        self.preset = preset_flags  # 0x10000 = zero-based half-open (BED)
        self._w = BGZFWriter(path)
        self._names: List[str] = []
        self._bins: List[Dict[int, List[Tuple[int, int]]]] = []
        self._linear: List[List[int]] = []

    def _ref_id(self, chrom: str) -> int:
        if not self._names or self._names[-1] != chrom:
            if chrom in self._names:
                raise ValueError(f"records not grouped by chromosome: {chrom}")
            self._names.append(chrom)
            self._bins.append({})
            self._linear.append([])
        return len(self._names) - 1

    def add(self, chrom: str, start: int, end: int, line: str) -> None:
        rid = self._ref_id(chrom)
        vbeg = self._w.tell_virtual()
        self._w.write(line.encode() if not line.endswith("\n") else line.encode())
        if not line.endswith("\n"):
            self._w.write(b"\n")
        vend = self._w.tell_virtual()
        b = reg2bin(start, max(end, start + 1))
        chunks = self._bins[rid].setdefault(b, [])
        if chunks and chunks[-1][1] == vbeg:
            chunks[-1] = (chunks[-1][0], vend)
        else:
            chunks.append((vbeg, vend))
        lin = self._linear[rid]
        for w16 in range(start >> 14, (max(end, start + 1) - 1 >> 14) + 1):
            while len(lin) <= w16:
                lin.append(0)
            if lin[w16] == 0 or vbeg < lin[w16]:
                lin[w16] = vbeg

    def close(self) -> None:
        self._w.close()
        with BGZFWriter(self.path + ".tbi") as out:
            names_blob = b"".join(n.encode() + b"\x00" for n in self._names)
            out.write(b"TBI\x01")
            out.write(
                struct.pack(
                    "<iiiiiiii",
                    len(self._names),
                    self.preset,
                    1,  # col_seq
                    2,  # col_beg
                    3,  # col_end
                    ord("#"),
                    0,  # skip
                    len(names_blob),
                )
            )
            out.write(names_blob)
            for rid in range(len(self._names)):
                bins = self._bins[rid]
                out.write(struct.pack("<i", len(bins)))
                for b in sorted(bins):
                    chunks = bins[b]
                    out.write(struct.pack("<Ii", b, len(chunks)))
                    for cb, ce in chunks:
                        out.write(struct.pack("<QQ", cb, ce))
                lin = self._linear[rid]
                # fill gaps with the next known offset going backward
                filled = list(lin)
                nxt = 0
                for i in range(len(filled) - 1, -1, -1):
                    if filled[i] == 0:
                        filled[i] = nxt
                    else:
                        nxt = filled[i]
                out.write(struct.pack("<i", len(filled)))
                for v in filled:
                    out.write(struct.pack("<Q", v))

    def __enter__(self) -> "TabixWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class TabixReader:
    """Minimal reader for our own outputs (tests + NFR stage re-reading occ
    tracks): loads the whole BGZF text (files are peak-scale, not
    genome-dense) and answers region queries from an in-memory dict."""

    def __init__(self, path: str):
        from nucleoatac_tpu.io.bgzf import read_bgzf

        self.rows: Dict[str, List[Tuple[int, int, List[str]]]] = {}
        for line in read_bgzf(path).decode().splitlines():
            if not line or line.startswith("#"):
                continue
            f = line.split("\t")
            self.rows.setdefault(f[0], []).append((int(f[1]), int(f[2]), f))

    def fetch(self, chrom: str, start: int, end: int) -> Iterable[List[str]]:
        for s, e, f in self.rows.get(chrom, []):
            if s < end and start < e:
                yield f
