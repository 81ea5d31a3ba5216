"""Smoke test entry — equivalent of
`/root/reference/src/nomad_audio/nomad_score_test.py:1-25` but with real
assertions (the reference only prints). Runs predict in dir mode on the
bundled demo data and, when the csv files exist, in csv mode too."""

from __future__ import annotations

import os


def run(config=None, nmr_dir="data/nmr-data", deg_dir="data/test-data"):
    from .api import get_nomad

    nomad = get_nomad()
    avg, scores = nomad.predict("dir", nmr_dir, deg_dir)
    assert avg.shape[0] == len(os.listdir(deg_dir))
    assert scores.shape == (len(os.listdir(deg_dir)), len(os.listdir(nmr_dir)))
    assert (avg["NOMAD"] >= 0).all() and (avg["NOMAD"] <= 2.0).all()
    print(avg)
    print(scores)

    nmr_csv, deg_csv = "data/nmr_file.csv", "data/test_file.csv"
    if os.path.isfile(nmr_csv) and os.path.isfile(deg_csv):
        avg_csv, scores_csv = nomad.predict("csv", nmr_csv, deg_csv)
        print(avg_csv)
        print(scores_csv)
    return avg, scores
