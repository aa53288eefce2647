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


def test_pallas_diag_conv_matches_xla_diag(rng):
    """ops/pallas_diag.py fused kernel == conv_stack_diag (interpret on
    CPU; on the chip it measured 1.56x faster and ~100x closer to f64 —
    probe_pallas_diag.py)."""
    import jax

    from nucleoatac_tpu.ops.pallas_diag import diag_conv_pallas
    from nucleoatac_tpu.ops.xcorr import conv_stack_diag

    B, S, W, C, K = 3, 34, 512, 2, 37
    x = rng.random((B, S, W)).astype(np.float32)
    k2d = rng.standard_normal((C, K, S)).astype(np.float32)
    ref = np.asarray(
        conv_stack_diag(
            jnp.asarray(x), jnp.asarray(k2d),
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    got = np.asarray(diag_conv_pallas(jnp.asarray(x), k2d, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_engine_conv_mode_diag_pallas_matches_diag(rng):
    """DeviceEngine(conv_mode='diag_pallas') norm track == the default
    diag path within the f32-vs-bf16x3 budget (both sit inside
    nuc.exact_tol of the f64 mirror; interpret mode on the CPU
    backend)."""
    from __graft_entry__ import _tiny_engine
    from nucleoatac_tpu.core.fragmentsizes import FragmentSizes
    from nucleoatac_tpu.core.mixture import FragmentMixDistribution
    from nucleoatac_tpu.models.data import pack_nibble_codes
    from nucleoatac_tpu.models.engine import DeviceEngine

    cfg, eng = _tiny_engine()
    s = np.arange(cfg.sizes.lower, cfg.sizes.upper, dtype=np.float64)
    counts = (
        2e4 * np.exp(-s / 45.0)
        + 1.5e4 * np.exp(-0.5 * ((s - 147) / 20) ** 2)
    ).astype(np.int64)
    fs = FragmentSizes(cfg.sizes.lower, cfg.sizes.upper, counts)
    mix = FragmentMixDistribution(cfg.sizes.lower, cfg.sizes.upper).fit(fs)
    eng_p = DeviceEngine(
        cfg, mix, fs, pwm=eng.pwm, conv_mode="diag_pallas"
    )

    B, F, W = 2, 256, eng.width
    mids = np.sort(rng.integers(0, W, size=(B, F)), axis=1).astype(np.int64)
    sizes = rng.integers(20, 250, size=(B, F)).astype(np.int64)
    from nucleoatac_tpu.models.data import encode_delta_batch

    db = np.zeros((B, F + W // 255 + 1, 2), np.uint8)
    encode_delta_batch(mids, sizes, db)
    nib = pack_nibble_codes(
        rng.integers(0, 4, size=(B, eng.seq_codes_width())).astype(np.uint8)
    )
    a = np.asarray(eng.nuc_step_delta_seq_m(jnp.asarray(db), jnp.asarray(nib)))
    b = np.asarray(eng_p.nuc_step_delta_seq_m(jnp.asarray(db), jnp.asarray(nib)))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)
