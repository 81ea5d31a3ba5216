#!/usr/bin/env python
"""Scoring demo: NOMAD non-matching-reference quality scores end to end.

Uses the reference repo's bundled demo wavs when present
(/root/reference/data), otherwise synthesizes a clean-vs-degraded set.
With real checkpoints in pt-models/ the scores match the published README
values; without them a seeded random backbone demonstrates the pipeline.

    python examples/score_demo.py [--model tiny|base] [--nmr DIR --deg DIR]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_demo_tree():
    from nomad_tpu.io import write_wav

    d = tempfile.mkdtemp(prefix="nomad_demo_")
    nmr = os.path.join(d, "nmr-data")
    deg = os.path.join(d, "test-data")
    os.makedirs(nmr)
    os.makedirs(deg)
    rng = np.random.default_rng(0)
    t = np.arange(32000) / 16000
    for i in range(4):
        clean = 0.3 * np.sin(2 * np.pi * (120 + 40 * i) * t) * np.exp(
            -((t - 1) ** 2)
        )
        write_wav(os.path.join(nmr, f"clean_{i}.wav"),
                  clean[None].astype(np.float32), 16000)
    for name, snr in (("light_noise", 20.0), ("heavy_noise", 3.0)):
        clean = 0.3 * np.sin(2 * np.pi * 150 * t) * np.exp(-((t - 1) ** 2))
        noise = 0.3 * 10 ** (-snr / 20) * rng.standard_normal(len(t))
        write_wav(os.path.join(deg, f"{name}.wav"),
                  (clean + noise)[None].astype(np.float32), 16000)
    return nmr, deg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny", choices=["tiny", "base"])
    ap.add_argument("--nmr")
    ap.add_argument("--deg")
    args = ap.parse_args()

    nmr, deg = args.nmr, args.deg
    if not nmr:
        ref = "/root/reference/data"
        if os.path.isdir(os.path.join(ref, "nmr-data")):
            nmr = os.path.join(ref, "nmr-data")
            deg = os.path.join(ref, "test-data")
        else:
            nmr, deg = synth_demo_tree()

    from nomad_tpu.api import Nomad
    from nomad_tpu.models import Wav2Vec2Config

    if args.model == "tiny":
        nomad = Nomad(config=Wav2Vec2Config.tiny(), emb_dim=16,
                      weights_dir="pt-models")
    else:
        nomad = Nomad(weights_dir="pt-models")

    avg, pairwise = nomad.predict("dir", nmr, deg)
    print("\nAverage NOMAD scores (lower = closer to clean speech):")
    print(avg)
    print("\nPairwise distances to each non-matching reference:")
    print(pairwise)


if __name__ == "__main__":
    main()
