"""Device engine: jitted batched window steps for the occ and nuc stages.

This replaces the reference's per-chunk worker functions
(reference:nucleoatac/Occupancy.py :: OccChunk.process and
NucleosomeCalling.py :: NucChunk.process — SURVEY.md §4.1/§4.2) with
fixed-shape jit-compiled programs over [B, F] fragment tensors
(DESIGN.md §10). Parameters (log-mixture table, template kernels, size
distribution) are closed over as device constants — replicated under
sharding (SURVEY.md §3.3).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nucleoatac_tpu.config import RunConfig
from nucleoatac_tpu.core.fragmentsizes import FragmentSizes
from nucleoatac_tpu.core.mixture import FragmentMixDistribution
from nucleoatac_tpu.core.vmat import VMat
from nucleoatac_tpu.ops import (
    bias_mat_batch,
    gauss_kernel,
    gauss_smooth_batch,
    nuc_scores_batch,
    occupancy_batch,
    rasterize_batch,
)
from nucleoatac_tpu.ops.xcorr import build_kernels


class OccTracks(NamedTuple):
    occ: jax.Array
    lower: jax.Array
    upper: jax.Array
    n: jax.Array


class NucTracks(NamedTuple):
    norm: jax.Array
    norm_smooth: jax.Array
    signal: jax.Array
    lr: jax.Array
    fuzz: jax.Array
    n: jax.Array


class DeviceEngine:
    def __init__(
        self,
        cfg: RunConfig,
        mix: FragmentMixDistribution,
        fragmentsizes: FragmentSizes,
        vmat: VMat | None = None,
    ):
        self.cfg = cfg
        self.width = cfg.window.width(cfg.occ, cfg.vmat)
        self.halo = cfg.window.halo(cfg.occ, cfg.vmat)
        # occupancy tables (float64 host -> float32 device constants)
        self.log_mix = jnp.asarray(mix.log_mix_table(cfg.occ), jnp.float32)
        self.alpha_grid = jnp.asarray(mix.alpha_grid(cfg.occ), jnp.float32)
        # template + kernels
        self.vmat = vmat or VMat.default(cfg.vmat)
        if (self.vmat.lower, self.vmat.upper) != (cfg.vmat.lower, cfg.vmat.upper):
            raise ValueError("VMat size range does not match config")
        self.f_kernels, self.b_kernels = build_kernels(
            self.vmat.mat, cfg.nuc.v_floor
        )
        # genome-wide nuc-range size distribution q(s) (DESIGN.md §6)
        h = fragmentsizes.get(cfg.vmat.lower, cfg.vmat.upper).astype(np.float64)
        tot = h.sum()
        q = h / tot if tot > 0 else np.full_like(h, 1.0 / len(h))
        self.size_probs = jnp.asarray(q, jnp.float32)
        self.smooth_kernel = jnp.asarray(gauss_kernel(cfg.nuc.smooth_sd))
        # core span inside the window for bias-row normalization
        self.core_lo = self.halo
        self.core_hi = self.width - self.halo

    # ---------------- step impls (pure; jitted wrappers below) ----------
    def occ_impl(self, mids, sizes, valid) -> OccTracks:
        mat = rasterize_batch(
            mids, sizes, valid, self.cfg.sizes.lower, self.cfg.sizes.upper, self.width
        )
        out = occupancy_batch(
            mat, self.log_mix, self.alpha_grid, self.cfg.occ.flank, self.cfg.occ.ci_drop
        )
        return OccTracks(out.occ, out.lower, out.upper, out.n)

    def nuc_impl(self, mids, sizes, valid, log_bias) -> NucTracks:
        fmat = rasterize_batch(
            mids, sizes, valid, self.cfg.vmat.lower, self.cfg.vmat.upper, self.width
        )
        b0 = bias_mat_batch(
            log_bias,
            self.size_probs,
            self.cfg.vmat.lower,
            self.cfg.vmat.upper,
            self.core_lo,
            self.core_hi,
        )
        sc = nuc_scores_batch(
            fmat, b0, self.f_kernels, self.b_kernels, self.cfg.nuc.var_floor
        )
        norm_smooth = gauss_smooth_batch(sc.norm, self.smooth_kernel)
        return NucTracks(sc.norm, norm_smooth, sc.signal, sc.lr, sc.fuzz, sc.n)

    @functools.partial(jax.jit, static_argnums=0)
    def occ_step(self, mids, sizes, valid) -> OccTracks:
        return self.occ_impl(mids, sizes, valid)

    @functools.partial(jax.jit, static_argnums=0)
    def nuc_step(self, mids, sizes, valid, log_bias) -> NucTracks:
        return self.nuc_impl(mids, sizes, valid, log_bias)

    def full_impl(self, mids, sizes, valid, log_bias):
        """Fused occ+nuc window step — the flagship device program
        (one rasterization feeds both stages via size-range slicing)."""
        mat = rasterize_batch(
            mids, sizes, valid, self.cfg.sizes.lower, self.cfg.sizes.upper, self.width
        )
        occ = occupancy_batch(
            mat, self.log_mix, self.alpha_grid, self.cfg.occ.flank, self.cfg.occ.ci_drop
        )
        vlo = self.cfg.vmat.lower - self.cfg.sizes.lower
        vup = self.cfg.vmat.upper - self.cfg.sizes.lower
        fmat = mat[:, vlo:vup, :]
        b0 = bias_mat_batch(
            log_bias,
            self.size_probs,
            self.cfg.vmat.lower,
            self.cfg.vmat.upper,
            self.core_lo,
            self.core_hi,
        )
        sc = nuc_scores_batch(
            fmat, b0, self.f_kernels, self.b_kernels, self.cfg.nuc.var_floor
        )
        norm_smooth = gauss_smooth_batch(sc.norm, self.smooth_kernel)
        return (
            OccTracks(occ.occ, occ.lower, occ.upper, occ.n),
            NucTracks(sc.norm, norm_smooth, sc.signal, sc.lr, sc.fuzz, sc.n),
        )

    @functools.partial(jax.jit, static_argnums=0)
    def full_step(self, mids, sizes, valid, log_bias):
        return self.full_impl(mids, sizes, valid, log_bias)
