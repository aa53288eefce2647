#!/usr/bin/env python
"""True conv-stack compute: direct vs diag restructure (slope timing with
dependent scalar fetch — the only honest discipline on the relay)."""
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

B = int(os.environ.get("PROF_B", "128"))
cfg, eng_direct = _tiny_engine(core=1024, batch=B)
from nucleoatac_tpu.core.pwm import PWM  # noqa: E402
from nucleoatac_tpu.models.engine import DeviceEngine  # noqa: E402

eng_diag = DeviceEngine(
    cfg, type("M", (), {})(), None
) if False else None
# build a diag engine sharing tables with the direct one
import copy  # noqa: E402

eng_direct.conv_mode = "direct"
eng2 = copy.copy(eng_direct)
eng2.conv_mode = "diag"
eng2._convs = jax.jit(eng2._convs_impl)

rng = np.random.default_rng(0)
W = eng_direct.width
S = cfg.sizes.upper - cfg.sizes.lower
N = 8
mats = [
    jax.device_put(rng.poisson(0.02, size=(B, S, W)).astype(np.float32))
    for _ in range(N)
]
logb = jax.device_put((0.3 * rng.standard_normal((B, W))).astype(np.float32))
b0 = eng_direct._bias(logb)


@jax.jit
def red(fo_bo):
    fo, bo = fo_bo
    return fo.sum() + bo.sum()


def med(fn, n=3):
    r = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        r.append(time.perf_counter() - t0)
    return float(np.median(r))


fl = (2 * 8 * 146 * 147 * (W - 147 + 1)) * B  # logical both stacks

for name, eng in (("direct", eng_direct), ("diag", eng2)):
    def run_k(k, eng=eng):
        acc = None
        for i in range(k):
            acc = red(eng._convs(mats[i % N], b0))
        return float(np.asarray(acc))

    run_k(1)
    t1 = med(lambda: run_k(1))
    t9 = med(lambda: run_k(9))
    t = (t9 - t1) / 8
    print(f"convs[{name}]: {t*1e3:7.2f} ms/batch -> {fl/t/1e12:5.1f} TF/s logical")

# sanity: outputs agree
a = jax.tree_util.tree_map(np.asarray, eng_direct._convs(mats[0], b0))
b = jax.tree_util.tree_map(np.asarray, eng2._convs(mats[0], b0))
for i in range(2):
    d = np.max(np.abs(a[i] - b[i]))
    print(f"max |direct - diag| out[{i}]: {d:.3e}")


# existing round-1 pallas kernel (VERDICT item 6: settle it)
try:
    from nucleoatac_tpu.ops.pallas_kernels import nuc_scores_pallas

    vlo = cfg.vmat.lower - cfg.sizes.lower
    vup = cfg.vmat.upper - cfg.sizes.lower

    @jax.jit
    def pallas_step(mat):
        fmat = mat[:, vlo:vup, :]
        sc = nuc_scores_pallas(
            fmat, b0, eng_direct.f_kernels, eng_direct.b_kernels,
            cfg.nuc.var_floor,
        )
        return sc.norm.sum() + sc.signal.sum()

    def run_k(k):
        acc = None
        for i in range(k):
            acc = pallas_step(mats[i % N])
        return float(np.asarray(acc))

    run_k(1)
    t1 = med(lambda: run_k(1))
    t9 = med(lambda: run_k(9))
    t = (t9 - t1) / 8
    print(f"convs[pallas r1]: {t*1e3:7.2f} ms/batch -> {fl/t/1e12:5.1f} TF/s logical")
except Exception as e:  # noqa: BLE001
    print(f"pallas r1 kernel failed on this backend: {type(e).__name__}: {e}")
