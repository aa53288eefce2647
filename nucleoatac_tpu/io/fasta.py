"""FASTA access without pysam (reference uses pysam.FastaFile — SURVEY.md L0).

Uses a `.fai` index when present (random access via seek), builds one
in-memory otherwise. Also provides writers used to generate synthetic
example data.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "rb")
        fai = path + ".fai"
        if os.path.exists(fai):
            self.index = self._read_fai(fai)
        else:
            self.index = self._build_index()
        self.references: List[str] = list(self.index.keys())
        self.lengths: List[int] = [self.index[n][0] for n in self.references]

    @staticmethod
    def _read_fai(path: str) -> Dict[str, Tuple[int, int, int, int]]:
        idx: Dict[str, Tuple[int, int, int, int]] = {}
        with open(path) as fh:
            for line in fh:
                f = line.rstrip("\n").split("\t")
                idx[f[0]] = (int(f[1]), int(f[2]), int(f[3]), int(f[4]))
        return idx

    def _build_index(self) -> Dict[str, Tuple[int, int, int, int]]:
        """(length, offset, linebases, linewidth) per sequence."""
        idx: Dict[str, Tuple[int, int, int, int]] = {}
        self._fh.seek(0)
        name = None
        length = 0
        offset = 0
        linebases = linewidth = 0
        pos = 0
        for raw in self._fh:
            if raw.startswith(b">"):
                if name is not None:
                    idx[name] = (length, offset, linebases or 1, linewidth or 2)
                name = raw[1:].split()[0].decode()
                pos += len(raw)
                offset = pos
                length = 0
                linebases = linewidth = 0
            else:
                seq = raw.rstrip(b"\r\n")
                if linebases == 0 and seq:
                    linebases = len(seq)
                    linewidth = len(raw)
                length += len(seq)
                pos += len(raw)
        if name is not None:
            idx[name] = (length, offset, linebases or 1, linewidth or 2)
        return idx

    def get_chrom_dict(self) -> Dict[str, int]:
        return {n: self.index[n][0] for n in self.references}

    def fetch(self, chrom: str, start: int, end: int) -> str:
        """0-based half-open; out-of-bounds clipped; returns uppercase."""
        length, offset, linebases, linewidth = self.index[chrom]
        start = max(0, start)
        end = min(length, end)
        if end <= start:
            return ""
        fb = offset + (start // linebases) * linewidth + (start % linebases)
        lb = offset + ((end - 1) // linebases) * linewidth + ((end - 1) % linebases) + 1
        # positioned read: no shared seek state, so concurrent fetches
        # from finisher worker threads are safe (a shared seek+read pair
        # interleaved across threads returned wrong-length sequences —
        # caught at BASELINE config-4 scale under the parallel finisher)
        raw = os.pread(self._fh.fileno(), lb - fb, fb)
        return raw.replace(b"\n", b"").replace(b"\r", b"").decode().upper()

    def close(self) -> None:
        self._fh.close()


def write_fasta(path: str, seqs: Dict[str, str], line: int = 60) -> None:
    with open(path, "w") as fh:
        for name, seq in seqs.items():
            fh.write(f">{name}\n")
            for i in range(0, len(seq), line):
                fh.write(seq[i : i + line] + "\n")
    # write a .fai alongside
    with open(path + ".fai", "w") as fh:
        offset = 0
        for name, seq in seqs.items():
            offset += len(name) + 2  # ">name\n"
            fh.write(f"{name}\t{len(seq)}\t{offset}\t{line}\t{line + 1}\n")
            nlines = (len(seq) + line - 1) // line
            offset += len(seq) + nlines
