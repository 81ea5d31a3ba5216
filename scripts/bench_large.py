#!/usr/bin/env python
"""BASELINE config 4 measured end-to-end: large-scale scoring — 10k
degraded utterances x 100 NMRs (synthetic 10 s waves standing in for
LibriSpeech), embeddings + blocked/sharded cdist via LargeScaleScorer.

Writes BENCH_LARGE.json at the repo root:
  {"metric": "large_scale_scoring", "wav_sec_per_sec_per_chip": ...,
   "detail": {embed_s, cdist_s, n_deg, n_nmr, h2d_MBps, ...}}

Scale knobs: LS_N_DEG (default 10000), LS_N_NMR (100), LS_SECONDS (10).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nomad_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nomad_tpu.models import NomadModel, Wav2Vec2Config  # noqa: E402
from nomad_tpu.scoring.engine import EmbeddingEngine  # noqa: E402
from nomad_tpu.scoring.large_scale import LargeScaleScorer  # noqa: E402


def synth(n, seconds, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * 16000)) / 16000
    out = []
    for i in range(n):
        f0 = 80.0 + 40.0 * rng.random()
        x = 0.1 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(t.shape)
        out.append(np.round(np.clip(x, -0.99, 0.99) * 32768).astype(np.int16))
    return out


def main():
    n_deg = int(os.environ.get("LS_N_DEG", 10000))
    n_nmr = int(os.environ.get("LS_N_NMR", 100))
    seconds = float(os.environ.get("LS_SECONDS", 10))

    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        from nomad_tpu.parallel import data_mesh

        mesh = data_mesh()

    model = NomadModel(Wav2Vec2Config.fast(), emb_dim=256)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 4000)), method=NomadModel.init_all
        )
    params = jax.device_get(params)
    engine = EmbeddingEngine(model, params, mesh=mesh)

    print(f"synthesizing {n_deg}+{n_nmr} x {seconds}s waves...", flush=True)
    deg = synth(n_deg, seconds, 5)
    nmr = synth(n_nmr, seconds, 6)

    # warm the bucket shape on a small slice first (compile outside timing)
    engine.embed_waves(deg[:64])

    t0 = time.time()
    emb_deg = engine.embed_waves(deg, progress=False)
    emb_nmr = engine.embed_waves(nmr, progress=False)
    embed_s = time.time() - t0

    scorer = LargeScaleScorer(engine)
    t0 = time.time()
    avg, dm = scorer.score_embeddings(emb_deg, emb_nmr)
    cdist_s = time.time() - t0
    assert avg.shape == (n_deg,) and dm.shape == (n_deg, n_nmr)
    assert np.all(np.isfinite(avg))

    total_wav = (n_deg + n_nmr) * seconds
    wall = embed_s + cdist_s
    result = {
        "metric": "large_scale_scoring",
        "wav_sec_per_sec_per_chip": round(total_wav / wall / max(1, n_dev if mesh else 1), 1),
        "detail": {
            "n_deg": n_deg,
            "n_nmr": n_nmr,
            "seconds_per_file": seconds,
            "embed_s": round(embed_s, 1),
            "cdist_s": round(cdist_s, 2),
            "wall_s": round(wall, 1),
            "backend": jax.default_backend(),
            "n_devices": n_dev,
            "precision": "fast",
        },
    }
    out = os.path.join(os.path.dirname(__file__), "..", "BENCH_LARGE.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
