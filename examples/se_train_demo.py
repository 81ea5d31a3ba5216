#!/usr/bin/env python
"""Speech-enhancement demo: Wave-U-Net trained with MSE + NOMAD loss on a
synthetic noisy/clean set (the runnable miniature of the reference's
nomad_loss_test.py / BASELINE config 3).

    python examples/se_train_demo.py [--epochs 2]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_dataset(n_files=8, seed=0):
    from nomad_tpu.io import write_wav

    base = tempfile.mkdtemp(prefix="nomad_se_")
    rng = np.random.default_rng(seed)
    dirs = {}
    for split in ("train", "valid", "test"):
        nd = os.path.join(base, f"noisy_{split}")
        cd = os.path.join(base, f"clean_{split}")
        os.makedirs(nd)
        os.makedirs(cd)
        for i in range(n_files):
            t = np.arange(20000) / 16000
            clean = (0.3 * np.sin(2 * np.pi * (130 + 25 * i) * t)).astype(
                np.float32
            )
            noisy = clean + 0.08 * rng.standard_normal(len(t)).astype(np.float32)
            write_wav(os.path.join(cd, f"p{i}.wav"), clean[None], 16000)
            write_wav(os.path.join(nd, f"p{i}.wav"), noisy[None], 16000)
        dirs[split] = (nd, cd)
    return dirs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--model", default="tiny", choices=["tiny", "base"])
    args = ap.parse_args()

    from nomad_tpu.api import Nomad
    from nomad_tpu.models import Wav2Vec2Config
    from nomad_tpu.training.se import SpeechEnhancement

    dirs = make_dataset()
    nomad = (
        Nomad(config=Wav2Vec2Config.tiny(), emb_dim=16, weights_dir="pt-models")
        if args.model == "tiny"
        else Nomad(weights_dir="pt-models")
    )
    config = {
        "noisy_train_dir": dirs["train"][0], "clean_train_dir": dirs["train"][1],
        "noisy_valid_dir": dirs["valid"][0], "clean_valid_dir": dirs["valid"][1],
        "noisy_test_dir": dirs["test"][0], "clean_test_dir": dirs["test"][1],
        "train_bs": 4, "valid_bs": 4, "test_bs": 4,
        "lr": 1e-3, "nomad_weight": 0.001, "target_sr": 16000,
        "patience": 10, "num_epochs": args.epochs, "test_every": 1,
        "n_layers": 6,
    }
    se = SpeechEnhancement(config, nomad=nomad)
    for epoch in range(args.epochs):
        tr = se.train(seed=epoch)
        va = se.eval()
        q = se.test()
        print(f"epoch {epoch+1}: train {tr:.5f} valid {va:.5f} "
              f"{q['metric']} {q['value']:.3f}")


if __name__ == "__main__":
    main()
