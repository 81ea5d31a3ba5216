#!/usr/bin/env python
"""Triplet fine-tuning demo on a synthetic NSIM-sampled dataset — the
runnable miniature of the reference training recipe (BASELINE config 5):
degrade clean audio, build NSIM-style triplets, fine-tune, evaluate ranking.

    python examples/train_triplet_demo.py [--epochs 2]
"""

import argparse
import os
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_dataset(seed=0):
    """Clean tones + NOISE/CLIP degradations at several levels + triplets."""
    from nomad_tpu.io import write_wav
    from nomad_tpu.utils.degradations import clip_signal, noise

    base = tempfile.mkdtemp(prefix="nomad_triplet_")
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(base, "CLEAN"))
    noise_path = os.path.join(base, "noise.wav")
    write_wav(noise_path,
              (0.2 * rng.standard_normal(8000)).astype(np.float32)[None], 16000)

    rows = []
    for i in range(6):
        t = np.arange(16000) / 16000
        clean = (0.3 * np.sin(2 * np.pi * (140 + 30 * i) * t)).astype(np.float32)
        ref = f"CLEAN/utt{i}.wav"
        write_wav(os.path.join(base, ref), clean[None], 16000)
        # degradation grid with a plausible NSIM-like label per level
        for kind, levels in (("NOISE", [30, 15, 5]), ("CLIP", [5, 25, 60])):
            os.makedirs(os.path.join(base, kind), exist_ok=True)
            for rank, lvl in enumerate(levels):
                out = f"{kind}/utt{i}_{kind}_{lvl}.wav"
                if kind == "NOISE":
                    noise(os.path.join(base, ref), noise_path,
                          os.path.join(base, out), snr_db=lvl)
                else:
                    clip_signal(os.path.join(base, ref),
                                os.path.join(base, out), clip_factor=lvl)
                rows.append({"reference": f"utt{i}.wav", "degraded": out,
                             "nsim": 0.95 - 0.25 * rank})
    return base, pd.DataFrame(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    from nomad_tpu.training import Training
    from nomad_tpu.utils.nsim_sampling import create_triplets

    base, nsim_df = build_dataset()
    triplets = create_triplets(nsim_df, N=2, hard_sampling=False, seed=0)
    triplets.insert(0, "db", 1)
    # the clean row references CLEAN/<name> which exists under base
    csv = os.path.join(base, "train.csv")
    triplets.to_csv(csv, index=False)
    print(f"{len(triplets)} triplets sampled")

    config = {
        "experiment_name": "Training",
        "out_dir": "triplet-demo",
        "root": base + "/",          # trailing slash: reference quirk Q9
        "train_df": csv,
        "valid_df": csv,
        "train_bs": 4, "val_bs": 4,
        "lr": 1e-3, "lr_decay_factor": 0.95, "lr_decay_step": 30,
        "num_epochs": args.epochs, "num_workers": 4,
        "emb_dim": 16, "patience": 10, "margin": 0.2,
        "freeze_convnet": True, "freeze_all": False,
        "current_level": [1], "trim": True, "eval_w2v": False,
        "model_size": "tiny",
        "run_dir": os.path.join(base, "run"),
    }
    tr = Training(config)
    tr.training_loop()
    print("checkpoints:", os.listdir(os.path.join(base, "run")))


if __name__ == "__main__":
    main()
