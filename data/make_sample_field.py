"""Generate a sorghum-like phenotype table for the table-backed FieldEnv.

The reference ships a real sorghum dataset (plant height per (row, range)
with genotype information — SURVEY.md §2 C10); that data is not
redistributable, so this script synthesizes a table with the same schema
and statistical shape: row/range grid, smooth spatial height field,
genotype-cluster features, and per-plot measurement noise.

    python data/make_sample_field.py --rows 25 --cols 40 -o data/sample_field.csv
"""

from __future__ import annotations

import argparse

import numpy as np


def make_table(rows: int, cols: int, seed: int = 0, n_genotypes: int = 8):
    rng = np.random.default_rng(seed)
    r, c = np.divmod(np.arange(rows * cols), cols)
    # smooth spatial field: sum of long-wavelength harmonics
    f = np.zeros(rows * cols)
    for _ in range(6):
        kx, ky = rng.uniform(0.02, 0.12, 2)
        ph = rng.uniform(0, 2 * np.pi, 2)
        f += rng.normal() * np.cos(2 * np.pi * kx * c + ph[0]) * np.cos(
            2 * np.pi * ky * r + ph[1]
        )
    # genotype blocks along rows (plots are planted per genotype)
    geno = (r * 31 + (c // 5) * 7) % n_genotypes
    geno_effect = rng.normal(0, 0.8, n_genotypes)
    feats = rng.normal(0, 1, (n_genotypes, 3))
    height = 120 + 15 * f + 10 * geno_effect[geno] + rng.normal(0, 2, rows * cols)
    import pandas as pd

    return pd.DataFrame({
        "row": r, "range": c, "height": np.round(height, 2),
        "genotype": geno,
        "feat_g1": feats[geno, 0], "feat_g2": feats[geno, 1],
        "feat_g3": feats[geno, 2],
    })


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=25)
    ap.add_argument("--cols", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--out", default="data/sample_field.csv")
    a = ap.parse_args()
    df = make_table(a.rows, a.cols, a.seed)
    df.to_csv(a.out, index=False)
    print(f"wrote {len(df)} plots to {a.out}")
