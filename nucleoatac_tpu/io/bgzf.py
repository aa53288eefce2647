"""BGZF (blocked gzip) writer/reader in pure Python (zlib).

Replaces the htslib/pysam substrate the reference leans on
(reference: pysam.tabix_compress — SURVEY.md §3.4 item 2). BGZF = a series
of gzip members, each carrying a BC extra subfield with the compressed
block size, so readers can seek by (compressed offset, within-block
offset) "virtual offsets" — which is what the tabix index stores.

A C++ implementation backs the hot ingest path (io/native); this module is
the portable fallback and the writer used for output files (output volume
is small relative to ingest).
"""
from __future__ import annotations

import struct
import zlib

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
_MAX_BLOCK = 65280  # uncompressed payload per block, like htslib


def _deflate_block(payload: bytes) -> bytes:
    """One complete BGZF member for ``payload`` (<= _MAX_BLOCK bytes).
    Pure function of the payload — blocks compress independently, which
    is what makes the writer's thread pool byte-transparent."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = co.compress(payload) + co.flush()
    # BSIZE field stores (total block size - 1); total =
    # header(12) + extra(6) + cdata + crc(4) + isize(4)
    bsize = len(cdata) + 26 - 1
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 0x08, 0x04,  # gzip magic, deflate, FEXTRA
        0,  # mtime
        0, 0xFF,  # XFL, OS=unknown
        6,  # XLEN
        0x42, 0x43, 2,  # 'B','C', SLEN=2
        bsize,
    )
    tail = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload))
    return header + cdata + tail


class BGZFWriter:
    """Writes BGZF; ``tell_virtual()`` returns the htslib virtual offset
    (coffset << 16 | uoffset) of the next byte to be written.

    Deflate runs on a small shared thread pool (zlib releases the GIL;
    htslib's bgzf_mt does the same): blocks are independent gzip members
    compressed from content-deterministic 64 KB boundaries, so output
    bytes are IDENTICAL to serial writing (pinned by test_io.py) while
    the compression wall overlaps the producer. Virtual offsets only need
    the block's compressed LENGTH, which is known when the future
    resolves; ``tell_virtual`` callers always sit at a block boundary +
    buffered remainder, so in-flight blocks are drained (``_sync``)
    before an offset is reported."""

    _pool = None

    @classmethod
    def _shared_pool(cls):
        if cls._pool is None:
            import os
            from concurrent.futures import ThreadPoolExecutor

            cls._pool = ThreadPoolExecutor(
                max_workers=min(4, os.cpu_count() or 1),
                thread_name_prefix="bgzf-deflate",
            )
        return cls._pool

    def __init__(self, fileobj_or_path, threads: bool = True):
        if isinstance(fileobj_or_path, str):
            self._fh = open(fileobj_or_path, "wb")
            self._own = True
        else:
            self._fh = fileobj_or_path
            self._own = False
        self._buf = bytearray()
        self._coffset = 0  # compressed bytes written so far
        self._block_lens = []  # compressed length of each flushed block
        self._pending = []  # in-flight block futures, in file order
        self._threads = threads

    def _sync(self) -> None:
        for f in self._pending:
            block = f.result()
            self._fh.write(block)
            self._coffset += len(block)
            self._block_lens.append(len(block))
        self._pending.clear()

    def tell_virtual(self) -> int:
        if self._pending:
            self._sync()
        return (self._coffset << 16) | len(self._buf)

    def tell_logical(self) -> int:
        """(block_sequence_number << 16) | uoffset — same ordering as the
        virtual offset but available WITHOUT waiting on in-flight deflate
        jobs (virtual offsets need every prior block's compressed size).
        Translate with :meth:`resolve_logical` once writing is done.
        TabixWriter indexes on logical offsets for exactly this reason."""
        return ((len(self._block_lens) + len(self._pending)) << 16) | len(
            self._buf
        )

    def resolve_logical(self, logical: int) -> int:
        """Logical offset -> virtual offset; valid after close()."""
        if self._offsets is None:
            raise ValueError("resolve_logical before close()")
        return (self._offsets[logical >> 16] << 16) | (logical & 0xFFFF)

    _offsets = None

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= _MAX_BLOCK:
            payload = bytes(self._buf[:_MAX_BLOCK])
            del self._buf[:_MAX_BLOCK]
            if self._threads:
                self._pending.append(
                    self._shared_pool().submit(_deflate_block, payload)
                )
                if len(self._pending) > 16:
                    self._sync()
            else:
                block = _deflate_block(payload)
                self._fh.write(block)
                self._coffset += len(block)
                self._block_lens.append(len(block))

    def close(self) -> None:
        if self._offsets is not None:  # already closed
            return
        if self._buf:
            if self._threads:
                self._pending.append(
                    self._shared_pool().submit(
                        _deflate_block, bytes(self._buf)
                    )
                )
            else:
                block = _deflate_block(bytes(self._buf))
                self._fh.write(block)
                self._coffset += len(block)
                self._block_lens.append(len(block))
            self._buf.clear()
        self._sync()
        self._fh.write(BGZF_EOF)
        self._coffset += len(BGZF_EOF)
        if self._own:
            self._fh.close()
        # block-seq -> compressed offset table for resolve_logical
        # (entry n_blocks = start of the EOF marker, for end-of-file
        # logical offsets with uoffset 0)
        offs = [0] * (len(self._block_lens) + 1)
        for i, ln in enumerate(self._block_lens):
            offs[i + 1] = offs[i] + ln
        self._offsets = offs

    def __enter__(self) -> "BGZFWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def bgzf_compress_file(src: str, dst: str) -> None:
    """Compress an existing plain file into BGZF (pysam.tabix_compress)."""
    with open(src, "rb") as fh, BGZFWriter(dst) as out:
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)


def read_bgzf(path: str) -> bytes:
    """Decompress a whole BGZF (or plain gzip) file; gzip module handles
    concatenated members."""
    import gzip

    with gzip.open(path, "rb") as fh:
        return fh.read()


def iter_bgzf_lines(path: str):
    """Stream decoded lines of a BGZF/gzip text file without materializing
    the whole file (genome-scale outputs; VERDICT r1 memory item)."""
    import gzip

    with gzip.open(path, "rt") as fh:
        for line in fh:
            yield line.rstrip("\n")


class BGZFReader:
    """Random-access BGZF block reader: inflate from a tabix virtual
    offset (coffset << 16 | uoffset) without touching earlier blocks —
    the htslib capability the indexed TabixReader needs (SURVEY.md §3.4
    item 2)."""

    def __init__(self, path: str):
        self._fh = open(path, "rb")

    def close(self) -> None:
        self._fh.close()

    def __enter__(self) -> "BGZFReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _read_block(self, coffset: int):
        """Returns (payload bytes, compressed block length) or (None, 0)
        at EOF."""
        fh = self._fh
        fh.seek(coffset)
        header = fh.read(12)
        if len(header) < 12:
            return None, 0
        if header[:4] != b"\x1f\x8b\x08\x04":
            raise ValueError("not a BGZF block (missing FEXTRA gzip member)")
        xlen = struct.unpack("<H", header[10:12])[0]
        extra = fh.read(xlen)
        bsize = None
        i = 0
        while i + 4 <= len(extra):
            si1, si2, slen = extra[i], extra[i + 1], struct.unpack(
                "<H", extra[i + 2 : i + 4]
            )[0]
            if si1 == 0x42 and si2 == 0x43 and slen == 2:
                bsize = struct.unpack("<H", extra[i + 4 : i + 6])[0] + 1
                break
            i += 4 + slen
        if bsize is None:
            raise ValueError("BGZF block missing BC subfield")
        cdata_len = bsize - 12 - xlen - 8
        cdata = fh.read(cdata_len)
        fh.read(8)  # crc + isize
        return zlib.decompress(cdata, -15), bsize

    def read_span(self, vbeg: int, vend: int) -> bytes:
        """All uncompressed bytes in the virtual-offset span [vbeg, vend)."""
        coff, uoff = vbeg >> 16, vbeg & 0xFFFF
        cend, uend = vend >> 16, vend & 0xFFFF
        out = bytearray()
        while True:
            payload, blen = self._read_block(coff)
            if payload is None:
                break
            if coff == cend:
                out += payload[uoff:uend]
                break
            out += payload[uoff:]
            uoff = 0
            coff += blen
            if coff > cend or (coff == cend and uend == 0):
                break
        return bytes(out)
