"""ctypes binding for the C++ ingest library (libnucio.so).

Raises ImportError until the library is built (io/native/Makefile);
callers fall back to the pure-Python scanner.
"""
from __future__ import annotations

import os

_here = os.path.dirname(__file__)
_lib_path = os.path.join(_here, "libnucio.so")

if not os.path.exists(_lib_path):
    raise ImportError("libnucio.so not built")

from nucleoatac_tpu.io.native.binding import scan_bam_native  # noqa: E402,F401
