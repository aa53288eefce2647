"""Real 2-process jax.distributed exercise of the collective mixture fit.

`fit_mixture_distributed`'s process_allgather branch only runs when
`jax.process_count() > 1` (models/distributed_pipeline.py), which no
in-process test can create — VERDICT r2 item 6. Here two CPU-backend
subprocesses form an actual jax.distributed cluster, each bins only its
chunk shard, and the allgather-summed fit is asserted bit-equal to the
single-process full fit (integer histogram -> deterministic f64 fit).
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax

    # sitecustomize on the axon image imports jax before user code, so
    # the env var alone is too late (tests/conftest.py note)
    jax.config.update("jax_platforms", "cpu")

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{{port}}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()

    from nucleoatac_tpu.config import RunConfig
    from nucleoatac_tpu.core.chunk import Chunk, ChunkList
    from nucleoatac_tpu.io.bam import BamFragments
    from nucleoatac_tpu.models.distributed_pipeline import (
        fit_mixture_distributed,
    )
    from nucleoatac_tpu.models.occ import fit_mixture

    rng = np.random.default_rng(7)
    n = 5000
    mids = np.sort(rng.integers(0, 20000, size=n)).astype(np.int32)
    sizes = np.clip(
        np.concatenate(
            [rng.normal(147, 20, n // 2), rng.exponential(45, n - n // 2) + 20]
        ),
        20, 250,
    ).astype(np.int32)
    frags = BamFragments(
        ["chr1"], [20000], {{"chr1": mids}}, {{"chr1": sizes}}
    )
    chunks = ChunkList(
        [Chunk("chr1", i * 2500, i * 2500 + 2000) for i in range(8)]
    )
    cfg = RunConfig()
    fs, mix = fit_mixture_distributed(frags, chunks, cfg, pid, 2)
    fs1, mix1 = fit_mixture(frags, chunks, cfg)
    assert np.array_equal(np.asarray(fs.vals), np.asarray(fs1.vals)), (
        "collective histogram != full-scan histogram"
    )
    pa = os.path.join(outdir, f"dist{{pid}}.txt")
    pb = os.path.join(outdir, f"single{{pid}}.txt")
    mix.save(pa)
    mix1.save(pb)
    assert open(pa).read() == open(pb).read(), "mixture fit differs"
    print(f"worker {{pid}} OK", flush=True)
    """
)


def test_two_process_allgather_fit_equals_single(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # no virtual-device split inside workers
    # drop the axon sitecustomize: it registers the TPU backend at
    # interpreter startup, before the worker can force the cpu platform
    pp = [q for q in env.get("PYTHONPATH", "").split(os.pathsep)
          if q and ".axon_site" not in q]
    env["PYTHONPATH"] = os.pathsep.join(pp)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert "worker 0 OK" in outs[0]
    assert "worker 1 OK" in outs[1]
