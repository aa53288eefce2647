"""Pallas fused nuc-score kernel vs mirror (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from nucleoatac_tpu import mirror
from nucleoatac_tpu.core.vmat import VMat
from nucleoatac_tpu.ops.pallas_kernels import nuc_scores_pallas
from nucleoatac_tpu.ops.xcorr import build_kernels

VLO, VUP = 105, 251


def test_pallas_nuc_scores_match_mirror(rng):
    B, W = 2, 1024
    vm = VMat.default()
    fk, bk = build_kernels(vm.mat)
    mids = rng.integers(0, W, size=(B, 600))
    sizes = rng.integers(VLO, VUP, size=(B, 600))
    fmat = np.stack(
        [mirror.rasterize(mids[b], sizes[b], VLO, VUP, W) for b in range(B)]
    ).astype(np.float32)
    logb = rng.normal(0, 0.3, size=(B, W))
    q = rng.random(VUP - VLO)
    q /= q.sum()
    b0 = np.stack(
        [mirror.bias_mat(logb[b], q, VLO, VUP, 100, W - 100) for b in range(B)]
    ).astype(np.float32)

    out = nuc_scores_pallas(
        jnp.asarray(fmat), jnp.asarray(b0), fk, bk, tile_w=256, interpret=True
    )
    for b in range(B):
        ref = mirror.nuc_scores(fmat[b].astype(np.int64), b0[b].astype(np.float64), vm.mat)
        np.testing.assert_allclose(np.asarray(out.n[b]), ref.n, atol=0.5)
        np.testing.assert_allclose(np.asarray(out.signal[b]), ref.signal, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.norm[b]), ref.norm, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(out.lr[b]), ref.lr, rtol=1e-3, atol=5e-2)
        np.testing.assert_allclose(np.asarray(out.fuzz[b]), ref.fuzz, rtol=1e-3, atol=1e-2)
