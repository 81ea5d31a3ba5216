"""NSIM-guided triplet sampling — equivalent of
`/root/reference/src/utils/nsim_triplet_sampling.py:13-77`.

Input: a dataframe with columns (reference, degraded, nsim) where NSIM
labels come from the offline ViSQOL tool (consumed via CSV — SURVEY §2.3).
Per reference group: append the clean file as an NSIM=1.0 row, sample an
anchor, positive = nearest-NSIM neighbor, negative = either 'easy' (NSIM
distance > positive + margin, sampled) or 'hard' (minimum remaining NSIM
distance); asserts positive-dist < negative-dist, N triplets per reference.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

MARGIN = 0.05


def create_triplets(
    df: pd.DataFrame,
    N: int = 1,
    hard_sampling: bool = True,
    margin: float = MARGIN,
    seed: int | None = None,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = df.drop_duplicates()
    anchor_list, positive_list, negative_list = [], [], []
    positive_nsim, negative_nsim = [], []
    positive_dist, negative_dist = [], []

    for ref in df["reference"].unique():
        df_g = df[df["reference"] == ref]
        clean_row = pd.DataFrame(
            {"degraded": [os.path.join("CLEAN", ref)], "nsim": [1.0]}
        )
        df_g = pd.concat([df_g.drop(columns=["reference"]), clean_row],
                         ignore_index=True)

        for _ in range(N):
            g = df_g.copy()
            anchor_idx = rng.integers(len(g))
            anchor = g.iloc[anchor_idx]
            g["nsim_dist"] = (g["nsim"] - anchor["nsim"]).abs()
            rest = g.drop(index=g.index[anchor_idx]).sort_values("nsim_dist")
            if len(rest) < 2:
                continue
            positive = rest.iloc[0]
            rest = rest.iloc[1:]

            if not hard_sampling:
                cand = rest[rest["nsim_dist"] > positive["nsim_dist"] + margin]
                if len(cand) == 0:
                    continue
                negative = cand.iloc[rng.integers(len(cand))]
            else:
                negative = rest.iloc[0]
                if not positive["nsim_dist"] < negative["nsim_dist"]:
                    continue  # degenerate tie; reference would assert

            assert positive["nsim_dist"] < negative["nsim_dist"]

            anchor_list.append(anchor["degraded"])
            positive_list.append(positive["degraded"])
            negative_list.append(negative["degraded"])
            positive_nsim.append(positive["nsim"])
            negative_nsim.append(negative["nsim"])
            positive_dist.append(positive["nsim_dist"])
            negative_dist.append(negative["nsim_dist"])

    return pd.DataFrame(
        {
            "Anchor": anchor_list,
            "Positive": positive_list,
            "Negative": negative_list,
            "anc_pos_dist": positive_dist,
            "anc_neg_dist": negative_dist,
        }
    )


def build_triplet_csvs(
    train_nsim_csv: str,
    valid_nsim_csv: str,
    out_train: str,
    out_valid: str,
    N: int = 3,
    seed: int = 10,
):
    """Produce the reference's train.csv/valid.csv schema: both easy (db=1)
    and hard (db=2) sampling levels concatenated (the levels the trainer
    filters with ``current_level``)."""
    frames = []
    for path, out in ((train_nsim_csv, out_train), (valid_nsim_csv, out_valid)):
        df = pd.read_csv(path)
        easy = create_triplets(df, N=N, hard_sampling=False, seed=seed)
        easy.insert(0, "db", 1)
        hard = create_triplets(df, N=N, hard_sampling=True, seed=seed)
        hard.insert(0, "db", 2)
        both = pd.concat([easy, hard], ignore_index=True).dropna()
        both.to_csv(out, index=False)
        frames.append(both)
    return frames
