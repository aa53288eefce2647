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


class BGZFWriter:
    """Writes BGZF; ``tell_virtual()`` returns the htslib virtual offset
    (coffset << 16 | uoffset) of the next byte to be written."""

    def __init__(self, fileobj_or_path):
        if isinstance(fileobj_or_path, str):
            self._fh = open(fileobj_or_path, "wb")
            self._own = True
        else:
            self._fh = fileobj_or_path
            self._own = False
        self._buf = bytearray()
        self._coffset = 0  # compressed bytes written so far

    def tell_virtual(self) -> int:
        return (self._coffset << 16) | len(self._buf)

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= _MAX_BLOCK:
            self._flush_block(self._buf[:_MAX_BLOCK])
            del self._buf[:_MAX_BLOCK]

    def _flush_block(self, payload: bytes) -> None:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = co.compress(bytes(payload)) + co.flush()
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
        tail = struct.pack("<II", zlib.crc32(bytes(payload)) & 0xFFFFFFFF, len(payload))
        block = header + cdata + tail
        self._fh.write(block)
        self._coffset += len(block)

    def close(self) -> None:
        if self._buf:
            self._flush_block(bytes(self._buf))
            self._buf.clear()
        self._fh.write(BGZF_EOF)
        self._coffset += len(BGZF_EOF)
        if self._own:
            self._fh.close()

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
