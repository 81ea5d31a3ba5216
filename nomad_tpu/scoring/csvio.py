"""Result CSV writers with reference-exact formats.

Contract (quirks Q2/Q3, `/root/reference/src/nomad_audio/nomad.py:112-139`):
  * labels = ``path.split('/')[-1].split('.')[0]`` (basename, first dot)
  * scores rounded to 3 decimals
  * avg CSV columns: ``Test File,NOMAD``
  * pairwise CSV columns: ``Test File`` + one column per NMR label
  * default output dir ``results-csv/<dd-mm-YYYY_HH-MM-SS>/`` with files
    ``{ts}_nomad_avg.csv`` and ``{ts}_nomad_scores.csv``; with
    ``results_path`` given: ``nomad_avg.csv`` / ``nomad_scores.csv``.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pandas as pd


def file_label(path: str) -> str:
    return path.split("/")[-1].split(".")[0]


def build_result_frames(
    test_paths, nmr_paths, distance_matrix: np.ndarray
) -> tuple[pd.DataFrame, pd.DataFrame]:
    avg = np.mean(distance_matrix, axis=1)
    test_labels = [file_label(p) for p in test_paths]
    df_avg = (
        pd.DataFrame({"Test File": test_labels, "NOMAD": avg})
        .set_index("Test File")
        .round(3)
    )
    df_dm = pd.DataFrame(distance_matrix).round(3)
    df_dm["Test File"] = test_labels
    df_dm.set_index("Test File", inplace=True)
    df_dm.columns = [file_label(p) for p in nmr_paths]
    return df_avg, df_dm


def write_results(
    df_avg: pd.DataFrame, df_dm: pd.DataFrame, results_path: str | None
) -> tuple[str, str]:
    if results_path is None:
        dt_string = datetime.now().strftime("%d-%m-%Y_%H-%M-%S")
        out_dir = os.path.join("results-csv", dt_string)
        os.makedirs(out_dir, exist_ok=True)
        avg_path = os.path.join(out_dir, f"{dt_string}_nomad_avg.csv")
        scores_path = os.path.join(out_dir, f"{dt_string}_nomad_scores.csv")
    else:
        avg_path = os.path.join(results_path, "nomad_avg.csv")
        scores_path = os.path.join(results_path, "nomad_scores.csv")
    df_avg.reset_index().to_csv(avg_path, index=False)
    df_dm.reset_index().to_csv(scores_path, index=False)
    return avg_path, scores_path
