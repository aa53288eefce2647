#!/usr/bin/env python
"""Honest wire-v2 loop throughput: occ pass + nuc pass, pipelined with
async fetches, every output materialized on host."""
from __future__ import annotations

import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from nucleoatac_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from __graft_entry__ import _tiny_engine  # noqa: E402
from nucleoatac_tpu.models.data import (  # noqa: E402
    encode_delta_fragments,
    pack_nibble_codes,
)

B = int(os.environ.get("PROF_B", "128"))
F = int(os.environ.get("PROF_F", "2048"))
DEPTH = int(os.environ.get("PROF_DEPTH", "3"))
N = 8
cfg, eng = _tiny_engine(core=1024, batch=B)
W = eng.width
rng = np.random.default_rng(0)

dbs = []
nibs = []
wp = eng.seq_codes_width()
for i in range(N):
    db = np.zeros((B, F + W // 255 + 1, 2), np.uint8)
    for b in range(B):
        mids = np.sort(rng.integers(0, W, size=F))
        szs = np.clip(rng.normal(120, 60, size=F), 1, 250).astype(np.int64)
        encode_delta_fragments(mids, szs, db, b)
    dbs.append(db)
    nibs.append(pack_nibble_codes(rng.integers(0, 4, size=(B, wp)).astype(np.uint8)))


def occ_pass(n_batches):
    q = deque()
    outs = []
    for i in range(n_batches):
        a = jax.device_put(dbs[i % N])
        o = eng.occ_step_delta_c3(a)
        o.copy_to_host_async()
        q.append(o)
        if len(q) > DEPTH:
            outs.append(np.asarray(q.popleft()))
    while q:
        outs.append(np.asarray(q.popleft()))
    return outs


def nuc_pass(n_batches):
    q = deque()
    outs = []
    for i in range(n_batches):
        a = jax.device_put(dbs[i % N])
        nb = jax.device_put(nibs[i % N])
        o = eng.nuc_step_delta_seq_c2(a, nb)
        o.copy_to_host_async()
        q.append(o)
        if len(q) > DEPTH:
            outs.append(np.asarray(q.popleft()))
    while q:
        outs.append(np.asarray(q.popleft()))
    return outs


occ_pass(2)
nuc_pass(2)
NB = 10
for name, fn in (("occ", occ_pass), ("nuc", nuc_pass)):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(NB)
        ts.append((time.perf_counter() - t0) / NB)
    t = float(np.median(ts))
    print(f"{name} pass: {t*1e3:8.2f} ms/batch -> {B/t:8.0f} windows/s")

# combined run-equivalent: both passes per window
t0 = time.perf_counter()
occ_pass(NB)
nuc_pass(NB)
t = (time.perf_counter() - t0) / NB
print(f"occ+nuc (two passes): {t*1e3:8.2f} ms/batch -> {B/t:8.0f} windows/s")


def fused_pass(n_batches):
    q = deque()
    outs = []
    for i in range(n_batches):
        a = jax.device_put(dbs[i % N])
        nb = jax.device_put(nibs[i % N])
        o = eng.run_step_delta(a, nb)
        o.copy_to_host_async()
        q.append(o)
        if len(q) > DEPTH:
            outs.append(eng.unpack_run(np.asarray(q.popleft())))
    while q:
        outs.append(eng.unpack_run(np.asarray(q.popleft())))
    return outs


fused_pass(2)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    fused_pass(NB)
    ts.append((time.perf_counter() - t0) / NB)
t = float(np.median(ts))
print(f"occ+nuc (fused pass): {t*1e3:8.2f} ms/batch -> {B/t:8.0f} windows/s")
