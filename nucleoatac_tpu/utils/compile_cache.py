"""Persistent compilation cache setup.

On the axon backend every jitted program is compiled through a remote
relay at ~1-9 min per program with huge variance; the on-disk JAX
compilation cache makes that a once-per-machine cost. Called by the CLIs,
bench.py and __graft_entry__ before any jit executes.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "NUCLEOATAC_COMPILE_CACHE", os.path.expanduser("~/.cache/nucleoatac_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache flags unavailable on some jax builds
        pass
