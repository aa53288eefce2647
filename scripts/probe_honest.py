#!/usr/bin/env python
"""Honest axon timings: every probe ends in a host fetch of real bytes.

block_until_ready on axon returns without a device round trip (probe_sync
shows 'synced' conv batches at 4.6 PF/s), so the ONLY valid timing
discipline is: enqueue work, then np.asarray() an output (or a scalar
reduced from it). Measures: RTT floor, upload/download bandwidth, true
per-stage compute, and pipelined loop throughput at several depths.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nucleoatac_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from __graft_entry__ import _tiny_engine  # noqa: E402
from nucleoatac_tpu.models.data import (  # noqa: E402
    encode_delta_fragments,
    pack_nibble_codes,
)

B = int(os.environ.get("PROF_B", "128"))
cfg, eng = _tiny_engine(core=1024, batch=B)
W = eng.width
S = cfg.sizes.upper - cfg.sizes.lower
rng = np.random.default_rng(0)
N = 8


def med(fn, n=5):
    r = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        r.append(time.perf_counter() - t0)
    return float(np.median(r))


# --- RTT floor: fetch 4 bytes already resident --------------------------
tiny = jax.device_put(np.float32(1.0)) + 0
np.asarray(tiny)
t_rtt = med(lambda: np.asarray(tiny))
print(f"RTT floor (fetch scalar):            {t_rtt*1e3:8.2f} ms")

# --- upload bandwidth: 32 MB put, then fetch a dependent scalar ----------
big = np.zeros((8 * 1024, 1024), np.float32)
s1 = jnp.sum(jax.device_put(big))
np.asarray(s1)
t_up32 = med(lambda: np.asarray(jnp.sum(jax.device_put(big))), 3)
print(f"upload 32MB + sum + RTT:             {t_up32*1e3:8.2f} ms "
      f"-> {32/max(t_up32 - t_rtt, 1e-9):6.1f} MB/s")

# --- download bandwidth: fetch 32 MB resident ----------------------------
dbig = jax.device_put(big) + 1
np.asarray(dbig)
t_down32 = med(lambda: np.asarray(dbig), 3)
print(f"download 32MB:                       {t_down32*1e3:8.2f} ms "
      f"-> {32/max(t_down32 - t_rtt, 1e-9):6.1f} MB/s")

# --- true stage compute: enqueue K reps (distinct inputs) + scalar fetch --
mats = [
    jax.device_put(rng.poisson(0.02, size=(B, S, W)).astype(np.float32))
    for _ in range(N)
]
logb = jax.device_put((0.3 * rng.standard_normal((B, W))).astype(np.float32))
b0 = eng._bias(logb)


@jax.jit
def reduce_convs(fo_bo):
    fo, bo = fo_bo
    return fo.sum() + bo.sum()


def run_convs_k(k):
    accs = []
    for i in range(k):
        accs.append(reduce_convs(eng._convs(mats[i % N], b0)))
    return float(np.asarray(sum(accs[-1:])))  # fetch last only after all


# time(k reps) - time(1 rep) removes RTT + fixed overhead
run_convs_k(1)
t1 = med(lambda: run_convs_k(1), 3)
t9 = med(lambda: run_convs_k(9), 3)
t_conv = (t9 - t1) / 8
fl = (2 * 8 * 146 * 147 * (W - 147 + 1)) * B  # 8 kernels f+b
print(f"convs true compute (slope):          {t_conv*1e3:8.2f} ms/batch "
      f"-> {fl/t_conv/1e12:5.1f} TF/s")


def run_occ_k(k):
    accs = []
    for i in range(k):
        accs.append(jnp.sum(eng._occ_packed(mats[i % N]).astype(jnp.int32)))
    return int(np.asarray(accs[-1]))


run_occ_k(1)
t1 = med(lambda: run_occ_k(1), 3)
t9 = med(lambda: run_occ_k(9), 3)
t_occ = (t9 - t1) / 8
fl_occ = 2 * S * 101 * W * B
print(f"occ true compute (slope):            {t_occ*1e3:8.2f} ms/batch "
      f"-> {fl_occ/t_occ/1e12:5.1f} TF/s")

# --- pipelined full loop at depth d --------------------------------------
F = 2048
mids = np.sort(rng.integers(0, W, size=(N, B, F)), axis=2).astype(np.int64)
szs = np.clip(rng.normal(120, 60, size=(N, B, F)), 1, 250).astype(np.int64)
dbs = np.zeros((N, B, F + W // 255 + 1, 2), np.uint8)
for i in range(N):
    for b in range(B):
        encode_delta_fragments(mids[i, b], szs[i, b], dbs[i], b)
wp = eng.seq_codes_width()
nibs = [
    pack_nibble_codes(rng.integers(0, 4, size=(B, wp)).astype(np.uint8))
    for _ in range(N)
]


def loop_depth(d, n_batches=8):
    inflight = []
    outs = []
    for i in range(n_batches):
        a = jax.device_put(dbs[i % N])
        nb = jax.device_put(nibs[i % N])
        o = eng.occ_step_delta_c(a)
        n5 = eng.nuc_step_delta_seq_c(a, nb)
        inflight.append((o, n5))
        while len(inflight) > d:
            po, pn = inflight.pop(0)
            outs.append((np.asarray(po), np.asarray(pn)))
    while inflight:
        po, pn = inflight.pop(0)
        outs.append((np.asarray(po), np.asarray(pn)))
    return outs


for d in (0, 1, 2, 4, 8):
    loop_depth(d, 4)
    t = med(lambda: loop_depth(d), 3) / 8
    print(f"pipelined loop depth {d}:             {t*1e3:8.2f} ms/batch "
          f"-> {B/t:8.0f} windows/s")
