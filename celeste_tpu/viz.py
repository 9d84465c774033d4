"""Plotting utilities (SURVEY.md C17: the reference ships matplotlib
experiment plots — model-vs-data stamps, posterior marginals, photo-z
posteriors).  Headless (Agg); every function returns the Figure and
optionally writes a PNG."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_model_vs_data(stamp, lam, path: str | None = None):
    """Three-panel: observed counts, model expectation lambda, Pearson
    residual (obs - lam)/sqrt(lam)."""
    counts = np.asarray(stamp.counts, np.float64)
    lam = np.asarray(lam, np.float64)
    resid = (counts - lam) / np.sqrt(np.maximum(lam, 1e-9))
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, img, title in zip(
        axes, [counts, lam, resid], ["observed counts", "model lambda", "pearson resid"]
    ):
        vmax = np.percentile(img, 99.5) if title != "pearson resid" else 4
        vmin = img.min() if title != "pearson resid" else -4
        im = ax.imshow(img, origin="lower", cmap="viridis" if title != "pearson resid"
                       else "coolwarm", vmin=vmin, vmax=vmax)
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_traces(samples, names=None, path: str | None = None, max_chains: int = 8):
    """Per-parameter trace plots over chains: [n_chains, n_steps, D]."""
    s = np.asarray(samples)
    d = s.shape[-1]
    names = names or [f"p{i}" for i in range(d)]
    fig, axes = plt.subplots(d, 1, figsize=(8, 1.6 * d), sharex=True, squeeze=False)
    for i in range(d):
        for c in range(min(s.shape[0], max_chains)):
            axes[i, 0].plot(s[c, :, i], lw=0.5, alpha=0.7)
        axes[i, 0].set_ylabel(names[i], fontsize=8)
    axes[-1, 0].set_xlabel("step")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_marginals(samples, truth=None, names=None, path: str | None = None):
    """Histogram per parameter with optional ground-truth line."""
    s = np.asarray(samples).reshape(-1, np.asarray(samples).shape[-1])
    d = s.shape[1]
    names = names or [f"p{i}" for i in range(d)]
    ncol = min(d, 4)
    nrow = (d + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(3 * ncol, 2.4 * nrow), squeeze=False)
    for i in range(d):
        ax = axes[i // ncol, i % ncol]
        ax.hist(s[:, i], bins=50, density=True, alpha=0.8)
        if truth is not None:
            ax.axvline(np.asarray(truth)[i], color="r", lw=1.5)
        ax.set_title(names[i], fontsize=9)
    for j in range(d, nrow * ncol):
        axes[j // ncol, j % ncol].axis("off")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig


def plot_photo_z(z_samples, z_true=None, path: str | None = None, z_max=6.0):
    """Redshift posterior histogram (the reference's headline quasar plot)."""
    z = np.asarray(z_samples).ravel()
    fig, ax = plt.subplots(figsize=(7, 3.2))
    ax.hist(z, bins=np.linspace(0, z_max, 150), density=True, alpha=0.85)
    if z_true is not None:
        ax.axvline(z_true, color="r", lw=1.5, label=f"z_true={z_true:.2f}")
        ax.legend()
    ax.set_xlabel("redshift z")
    ax.set_ylabel("posterior density")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
    return fig
