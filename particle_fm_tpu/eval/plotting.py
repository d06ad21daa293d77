"""Plotting suite (host-side matplotlib).

Parity: particle_fm/utils/plotting.py:29-1619 — the master data-comparison
grid (particle features, jet features, jet mass, multiplicities, selected-
particle pT), substructure comparisons, loss curves, and ratio panels. One
parametrized implementation replaces the reference's per-dataset clones.
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from particle_fm_tpu.data.utils import (
    calculate_jet_features,
    get_pt_of_selected_particles,
)

FEATURE_LABELS = [r"$\eta^{rel}$", r"$\phi^{rel}$", r"$p_T^{rel}$"]
JET_LABELS = [r"jet $p_T$", "jet $y$", r"jet $\phi$", "jet mass"]


def apply_mpl_styles() -> None:
    """House style (parity: plotting.py:29)."""
    plt.rcParams.update(
        {
            "figure.dpi": 110,
            "axes.grid": True,
            "grid.alpha": 0.3,
            "font.size": 11,
            "legend.frameon": False,
            "hist.bins": 100,
        }
    )


def _hist_pair(ax, real, gen, bins=100, label_real="real", label_gen="generated",
               log=False, xlabel=""):
    lo = min(np.nanmin(real), np.nanmin(gen))
    hi = max(np.nanmax(real), np.nanmax(gen))
    if lo == hi:
        hi = lo + 1.0
    edges = np.linspace(lo, hi, bins + 1)
    ax.hist(real, bins=edges, histtype="stepfilled", alpha=0.4, label=label_real,
            density=True)
    ax.hist(gen, bins=edges, histtype="step", lw=1.5, label=label_gen, density=True)
    if log:
        ax.set_yscale("log")
    ax.set_xlabel(xlabel)
    ax.legend()


def prepare_data_for_plotting(
    data: np.ndarray, calculate_efps: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """(B, N, [eta, phi, pt]) -> (jet features, multiplicities, efps).
    Parity: plotting.py:1231-1289."""
    jets = calculate_jet_features(data)
    mult = np.count_nonzero(data[..., 2], axis=1)
    efps = None
    if calculate_efps:
        from particle_fm_tpu.eval.efp import efps as efps_fn

        efps = efps_fn(data)
    return jets, mult, efps


def plot_data(
    real: np.ndarray,
    gen: np.ndarray,
    save_path: str | None = None,
    plot_efps: bool = False,
    selected_particles: tuple = (1, 3, 10),
    suffix: str = "",
) -> "str | matplotlib.figure.Figure":
    """Master comparison grid: per-feature particle hists, jet features,
    multiplicity, selected-particle pT (parity: plotting.py:117-977)."""
    apply_mpl_styles()
    n_feat = min(real.shape[-1], 3)
    rows = 3 + (1 if plot_efps else 0)
    fig, axes = plt.subplots(rows, 4, figsize=(18, 4 * rows))

    # row 0: particle features (real particles only)
    for f in range(n_feat):
        rm = real[..., f][np.abs(real).sum(-1) > 0]
        gm = gen[..., f][np.abs(gen).sum(-1) > 0]
        _hist_pair(axes[0, f], rm, gm, xlabel=FEATURE_LABELS[f], log=(f == 2))
    axes[0, 3].axis("off")

    # row 1: jet features
    jets_r, mult_r, efps_r = prepare_data_for_plotting(real, plot_efps)
    jets_g, mult_g, efps_g = prepare_data_for_plotting(gen, plot_efps)
    for f in range(4):
        _hist_pair(axes[1, f], jets_r[:, f], jets_g[:, f], xlabel=JET_LABELS[f])

    # row 2: multiplicity + selected-particle pT
    _hist_pair(axes[2, 0], mult_r, mult_g, bins=40, xlabel="multiplicity")
    pt_r = get_pt_of_selected_particles(real, selected_particles)
    pt_g = get_pt_of_selected_particles(gen, selected_particles)
    for i, k in enumerate(selected_particles[:3]):
        _hist_pair(
            axes[2, i + 1], pt_r[i], pt_g[i], xlabel=rf"$p_T^{{rel}}$ of particle {k}", log=True
        )

    if plot_efps and efps_r is not None:
        for f in range(min(4, efps_r.shape[-1])):
            _hist_pair(axes[3, f], efps_r[:, f], efps_g[:, f], xlabel=f"EFP {f}", log=True)

    fig.suptitle(f"real vs generated {suffix}")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path)
        plt.close(fig)
        return save_path
    return fig  # no path: hand the figure back (notebook display)


def create_and_plot_data(real, gen, save_folder: str, plot_name: str = "plot", **kwargs):
    """Parity shim for plotting.py:979."""
    return plot_data(real, gen, os.path.join(save_folder, f"{plot_name}.png"), **kwargs)


def plot_substructure(hlvs_real: dict, hlvs_gen: dict, save_path: str | None = None) -> "str | matplotlib.figure.Figure":
    """tau21 / tau32 / d2 comparison (parity: plotting.py:1422-1471)."""
    apply_mpl_styles()
    keys = ["tau21", "tau32", "d2", "jet_mass"]
    fig, axes = plt.subplots(1, len(keys), figsize=(4.5 * len(keys), 4))
    for ax, k in zip(axes, keys):
        _hist_pair(ax, hlvs_real[k], hlvs_gen[k], bins=60, xlabel=k)
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path)
        plt.close(fig)
        return save_path
    return fig  # no path: hand the figure back (notebook display)


def plot_loss_curves(metrics_history: list[dict], save_path: str | None = None,
                     keys: tuple = ("train_loss", "val_loss")) -> "str | matplotlib.figure.Figure":
    """Loss curves from the trainer's metric history (parity: plotting.py:1127)."""
    apply_mpl_styles()
    fig, ax = plt.subplots(figsize=(7, 4.5))
    epochs = [m.get("epoch", i) for i, m in enumerate(metrics_history)]
    for k in keys:
        ys = [m.get(k, np.nan) for m in metrics_history]
        ax.plot(epochs, ys, label=k)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path)
        plt.close(fig)
        return save_path
    return fig  # no path: hand the figure back (notebook display)


def plot_feature_ratios(real: np.ndarray, gen: np.ndarray, save_path: str | None = None,
                        labels: list | None = None) -> "str | matplotlib.figure.Figure":
    """Per-feature histograms with gen/real ratio panels
    (parity: plotting.py:1510-1569)."""
    apply_mpl_styles()
    n_feat = real.shape[-1]
    labels = labels or [f"feature {i}" for i in range(n_feat)]
    fig, axes = plt.subplots(
        2, n_feat, figsize=(4.5 * n_feat, 6), height_ratios=[3, 1], sharex="col"
    )
    if n_feat == 1:
        axes = axes.reshape(2, 1)
    for f in range(n_feat):
        r = real[..., f].ravel()
        g = gen[..., f].ravel()
        lo, hi = np.nanmin(r), np.nanmax(r)
        edges = np.linspace(lo, hi if hi > lo else lo + 1, 61)
        hr, _ = np.histogram(r, bins=edges, density=True)
        hg, _ = np.histogram(g, bins=edges, density=True)
        centers = 0.5 * (edges[1:] + edges[:-1])
        axes[0, f].stairs(hr, edges, fill=True, alpha=0.4, label="real")
        axes[0, f].stairs(hg, edges, lw=1.5, label="generated")
        axes[0, f].legend()
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(hr > 0, hg / hr, np.nan)
        axes[1, f].plot(centers, ratio, ".")
        axes[1, f].axhline(1.0, color="k", lw=0.8)
        axes[1, f].set_ylim(0.5, 1.5)
        axes[1, f].set_xlabel(labels[f])
        axes[1, f].set_ylabel("gen/real")
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path)
        plt.close(fig)
        return save_path
    return fig  # no path: hand the figure back (notebook display)
