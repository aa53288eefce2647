"""Diagnostic figures (EPS, headless Agg) — reference parity artifacts:
occ_fit.eps, nuc_dist.eps, V-plot images (SURVEY.md §6 metrics row)."""
from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_occ_fit(mix, path: str) -> None:
    fig, ax = plt.subplots(figsize=(6, 4))
    s = mix.sizes
    ax.plot(s, mix.p_data, "k.", ms=3, label="data")
    ax.plot(s, (1 - mix.w) * mix.p_nfr, "b-", label=f"NFR (tau={mix.tau:.1f})")
    ax.plot(s, mix.w * mix.p_nuc, "r-", label=f"Nucleosomal (w={mix.w:.2f})")
    ax.plot(s, mix.w * mix.p_nuc + (1 - mix.w) * mix.p_nfr, "g--", lw=1, label="mixture")
    ax.set_xlabel("fragment size (bp)")
    ax.set_ylabel("probability")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def plot_fragmentsizes(fs, path: str) -> None:
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.arange(fs.lower, fs.upper), fs.vals)
    ax.set_xlabel("fragment size (bp)")
    ax.set_ylabel("count")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def plot_vmat(vmat, path: str) -> None:
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(
        vmat.mat,
        aspect="auto",
        origin="lower",
        extent=[-(vmat.width // 2), vmat.width // 2, vmat.lower, vmat.upper],
        cmap="viridis",
    )
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("position relative to dyad (bp)")
    ax.set_ylabel("fragment size (bp)")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def plot_nuc_dist(dist: np.ndarray, path: str) -> None:
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.arange(len(dist)), dist)
    ax.set_xlabel("distance between adjacent dyads (bp)")
    ax.set_ylabel("count")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)

def plot_vmat_1d(vmat, path: str) -> None:
    """1-D projections of the template (reference VMat.plot_1d,
    SURVEY.md §3.2): the position profile (insertion footprint around the
    dyad) and the size profile."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8, 3.2))
    pos = vmat.position_profile()
    x = np.arange(len(pos)) - vmat.width // 2
    ax1.plot(x, pos, "k-")
    ax1.set_xlabel("position relative to dyad (bp)")
    ax1.set_ylabel("density")
    ax1.set_title("position profile")
    sz = vmat.size_profile()
    ax2.plot(np.arange(vmat.lower, vmat.upper), sz, "k-")
    ax2.set_xlabel("fragment size (bp)")
    ax2.set_title("size profile")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
