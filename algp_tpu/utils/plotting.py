"""Result plotting (SURVEY.md §2 C14): posterior-mean / variance maps,
sample-path overlays, RMSE learning curves.  Matplotlib, Agg backend —
import is lazy so headless CI never touches a display."""

from __future__ import annotations

from typing import Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def field_maps(env, mean, var, sampled_idx=None, path: Optional[str] = None):
    """Truth / posterior-mean / posterior-std maps side by side, with the
    sampled locations overlaid (the reference's variance-map figures)."""
    plt = _plt()
    nr, nc = env.num_rows, env.num_cols
    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6), constrained_layout=True)
    panels = [
        ("truth", np.asarray(env.f).reshape(nr, nc)),
        ("posterior mean", np.asarray(mean).reshape(nr, nc)),
        ("posterior std", np.sqrt(np.maximum(np.asarray(var), 0)).reshape(nr, nc)),
    ]
    for ax, (title, img) in zip(axes, panels):
        im = ax.imshow(img, origin="lower", aspect="auto")
        ax.set_title(title)
        fig.colorbar(im, ax=ax, shrink=0.85)
        if sampled_idx is not None and title != "truth":
            r, c = np.divmod(np.asarray(sampled_idx), nc)
            ax.plot(c, r, "r.", markersize=3)
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig


def learning_curves(histories: dict[str, list[dict]], path: Optional[str] = None):
    """RMSE (and mean posterior variance) vs samples, one line per
    strategy — the reference's headline evaluation figure."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2, figsize=(10, 3.6), constrained_layout=True)
    for name, hist in histories.items():
        # each panel derives its x from the records carrying ITS metric —
        # pairing rmse-filtered x with mean_var-filtered y crashed (or
        # silently misaligned) on histories where the keys don't co-occur
        ns = [h["n_sampled"] for h in hist if "rmse" in h]
        rmse = [h["rmse"] for h in hist if "rmse" in h]
        ns_mv = [h["n_sampled"] for h in hist if "mean_var" in h]
        mv = [h["mean_var"] for h in hist if "mean_var" in h]
        axes[0].plot(ns, rmse, marker="o", markersize=3, label=name)
        axes[1].plot(ns_mv, mv, marker="o", markersize=3, label=name)
    axes[0].set_xlabel("samples collected"); axes[0].set_ylabel("RMSE")
    axes[1].set_xlabel("samples collected"); axes[1].set_ylabel("mean posterior var")
    axes[0].legend()
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig


def path_plot(env, node_seqs: list, path: Optional[str] = None):
    """Overlay traversed paths on the field grid (reference path plots)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4), constrained_layout=True)
    nc = env.num_cols
    for k, seq in enumerate(node_seqs):
        r, c = np.divmod(np.asarray(seq), nc)
        ax.plot(c, r, "-o", markersize=2.5, linewidth=1.0, alpha=0.8,
                label=f"step {k}" if len(node_seqs) <= 8 else None)
    ax.set_xlim(-0.5, env.num_cols - 0.5)
    ax.set_ylim(-0.5, env.num_rows - 0.5)
    ax.set_xlabel("range"); ax.set_ylabel("row")
    if len(node_seqs) <= 8:
        ax.legend(fontsize=7)
    if path:
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig
