"""Multi-host orchestration: jax.distributed init + per-host work split.

Replaces the reference's single-host multiprocessing model (SURVEY.md
§3.3): on a pod slice each host process scans the (shared) BAM, takes a
deterministic contiguous slice of the window tiles, runs the sharded
device steps over its local devices, and host 0 concatenates per-host
partial outputs into the genome-ordered files (hosts write
`<out>.part<k>` shards; `merge_host_shards` concatenates — bedgraph/BED
rows are disjoint and ordered because the tile split is contiguous in
genome order).
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed from args or env
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID).
    Returns (process_id, num_processes); (0, 1) when not distributed."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return 0, 1
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return process_id, num_processes


def host_tile_slice(tiles: Sequence, process_id: int, num_processes: int) -> List:
    """Contiguous (genome-ordered) slice of tiles for this host, balanced
    by count."""
    n = len(tiles)
    lo = (n * process_id) // num_processes
    hi = (n * (process_id + 1)) // num_processes
    return list(tiles[lo:hi])


def merge_host_shards(out_prefix: str, suffix: str, num_processes: int) -> None:
    """Concatenate per-host BGZF shards `<prefix>.part<k><suffix>` into
    `<prefix><suffix>` (BGZF members concatenate losslessly; the EOF
    blocks of intermediate shards are legal empty members). Streams in
    1 MB blocks — shards are genome-scale."""
    dst = f"{out_prefix}{suffix}"
    with open(dst, "wb") as out:
        for k in range(num_processes):
            part = f"{out_prefix}.part{k}{suffix}"
            with open(part, "rb") as fh:
                while True:
                    block = fh.read(1 << 20)
                    if not block:
                        break
                    out.write(block)
            os.remove(part)
            tbi = part + ".tbi"
            if os.path.exists(tbi):
                os.remove(tbi)
    rebuild_tabix(dst)


def rebuild_tabix(path: str) -> None:
    """Re-index a merged BGZF text file (concatenation invalidates the
    per-shard virtual offsets, so the index is rebuilt from scratch).
    Streams line-by-line — constant memory at genome scale."""
    from nucleoatac_tpu.io.bgzf import iter_bgzf_lines
    from nucleoatac_tpu.io.tabix import TabixWriter

    tmp = path + ".reindex"
    with TabixWriter(tmp) as w:
        for line in iter_bgzf_lines(path):
            if not line:
                continue
            f = line.split("\t")
            w.add(f[0], int(f[1]), int(f[2]), line)
    os.replace(tmp, path)
    os.replace(tmp + ".tbi", path + ".tbi")
