"""Render the MI/entropy crossover synthesis figure from the committed
paired-study artifacts → benchmarks/strategy_crossover_r03.png.

Each point is the PAIRED per-seed mean of (MI − entropy) budget-matched
held-out RMSE at one travel budget, ±2 SEM; budgets are normalised to
each grid's reference study (100×100 → b800, 40×40 → b160) so the two
geometries share an axis.  Palette: validated default reference
instance (categorical slots 1-2)."""

import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def paired(path):
    d = json.load(open(path))
    pd = d["summary"]["paired_diffs"]["mi-entropy"]
    return pd["mean"], pd["sem"]


def main():
    g10k = [(400, *paired("benchmarks/strategy_curves_r03_10k_b400.json")),
            (800, *paired("benchmarks/strategy_curves_r03_10k.json")),
            (1600, *paired("benchmarks/strategy_curves_r03_10k_b1600.json")),
            (3200, *paired("benchmarks/strategy_curves_r03_10k_b3200.json"))]
    g40 = [(80, *paired("benchmarks/strategy_curves_r03_40x40_b80.json")),
           (160, *paired("benchmarks/strategy_curves_r03_40x40_cpu.json")),
           (320, *paired("benchmarks/strategy_curves_r03_40x40_b320.json")),
           (640, *paired("benchmarks/strategy_curves_r03_40x40_b640.json"))]

    SURFACE, TXT, TXT2 = "#fcfcfb", "#0b0b0b", "#52514e"
    C1, C2 = "#2a78d6", "#eb6834"
    fig, ax = plt.subplots(figsize=(7.2, 4.4), constrained_layout=True)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    for data, color, label, norm in (
        (g10k, C1, "100×100 grid (10k pts, TPU)", 800.0),
        (g40, C2, "40×40 grid (1.6k pts, CPU)", 160.0),
    ):
        x = [b / norm for b, _, _ in data]
        y = [m for _, m, _ in data]
        e = [2 * s for _, _, s in data]
        ax.errorbar(x, y, yerr=e, color=color, lw=2, marker="o", ms=8,
                    capsize=3, label=label, zorder=3,
                    markeredgecolor=SURFACE, markeredgewidth=2)
    ax.axhline(0.0, color="#9a9892", lw=1, zorder=1)
    ax.set_xscale("log", base=2)
    ax.set_xticks([0.5, 1, 2, 4])
    ax.set_xticklabels(["0.5×", "1×", "2×", "4×"])
    ax.text(0.52, 0.0405, "entropy better ↑", color=TXT2, fontsize=9,
            va="bottom")
    ax.text(0.52, -0.028, "MI better ↓", color=TXT2, fontsize=9, va="top")
    ax.set_xlabel("travel budget (relative to each grid's reference study)",
                  color=TXT)
    ax.set_ylabel("paired MI − entropy held-out RMSE", color=TXT)
    ax.set_title("The MI/entropy crossover is a budget property, not a "
                 "grid artifact\n(error bars: ±2 SEM of the paired "
                 "per-seed difference)", color=TXT, fontsize=11)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color("#d8d6d0")
    ax.tick_params(colors=TXT2)
    ax.grid(axis="y", color="#ececea", lw=0.8, zorder=0)
    ax.legend(frameon=False, loc="upper left", fontsize=9)
    fig.savefig("benchmarks/strategy_crossover_r03.png", dpi=150)


if __name__ == "__main__":
    main()
