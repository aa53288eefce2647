"""Minimal BAM writer: synthesize coordinate-sorted paired-end BAMs.

The reference ships real example data (`example/` — SURVEY.md §3.2); that
artifact is unavailable (empty reference mount), so tests and the example
pipeline generate synthetic ATAC-seq data with a known ground truth
through this writer (SURVEY.md §8.2 step 1).
"""
from __future__ import annotations

import struct
from typing import List, Sequence, Tuple

import numpy as np

from nucleoatac_tpu.io.bgzf import BGZFWriter


def _encode_record(
    ref_id: int,
    pos: int,
    mapq: int,
    flag: int,
    mate_pos: int,
    tlen: int,
    read_len: int,
    name: bytes,
) -> bytes:
    """One alignment record with a trivial CIGAR (<read_len>M), seq of A's."""
    n_cigar = 1
    cigar = struct.pack("<I", (read_len << 4) | 0)  # M
    l_seq = read_len
    seq = bytes([0x11] * ((l_seq + 1) // 2))  # 'AA' packed (A=1)
    qual = bytes([30] * l_seq)
    name_z = name + b"\x00"
    data = (
        struct.pack(
            "<iiBBHHHIiii",
            ref_id,
            pos,
            len(name_z),
            mapq,
            0,
            n_cigar,
            flag,
            l_seq,
            ref_id,
            mate_pos,
            tlen,
        )
        + name_z
        + cigar
        + seq
        + qual
    )
    return struct.pack("<i", len(data)) + data


def write_bam(
    path: str,
    ref_names: Sequence[str],
    ref_lengths: Sequence[int],
    fragments: Sequence[Tuple[int, int, int]],
    read_len: int = 36,
    mapq: int = 60,
) -> None:
    """fragments: (ref_id, left, size) RAW genomic fragments (pre +4/-5);
    emits a proper pair per fragment, coordinate-sorted."""
    recs: List[Tuple[int, int, bytes]] = []
    for i, (rid, left, size) in enumerate(fragments):
        name = f"frag{i}".encode()
        right_start = left + size - read_len
        # read1 forward at left, read2 reverse at right_start
        f1 = 0x1 | 0x2 | 0x20 | 0x40  # paired, proper, mate-reverse, first
        f2 = 0x1 | 0x2 | 0x10 | 0x80  # paired, proper, reverse, second
        recs.append((rid, left, _encode_record(rid, left, mapq, f1, right_start, size, read_len, name)))
        recs.append((rid, right_start, _encode_record(rid, right_start, mapq, f2, left, -size, read_len, name)))
    recs.sort(key=lambda r: (r[0], r[1]))

    header_text = "".join(
        f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in zip(ref_names, ref_lengths)
    ).encode()
    with BGZFWriter(path) as out:
        out.write(b"BAM\x01")
        out.write(struct.pack("<i", len(header_text)))
        out.write(header_text)
        out.write(struct.pack("<i", len(ref_names)))
        for n, l in zip(ref_names, ref_lengths):
            nz = n.encode() + b"\x00"
            out.write(struct.pack("<i", len(nz)) + nz + struct.pack("<i", l))
        for _, _, rec in recs:
            out.write(rec)
