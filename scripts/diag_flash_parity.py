#!/usr/bin/env python
"""Is bf16 flash attention inside the 1e-3 score budget at long T'?

Round-5 long-file leg: forced 'pallas' (kernel DEFAULT precision —
single-pass bf16 dots, f32 online-softmax accumulators) ran 1.192x vs
xla at 48 s files (866.3 vs 727.0 wav-s/s), while the round-3 'auto'
flip (flash-HIGHEST, parity-grade) ran 0.651x. The production 'balanced'
recipe already runs the einsum attention scores single-pass bf16
(attn_score_precision='default', measured 6.6e-4 composite) — so the
question for re-arming 'auto' in the long-file regime is whether
balanced+flash-bf16 stays inside the budget vs the 'exact' anchor.

Measures max pairwise distance-matrix delta on N long speech files:
  A. exact + xla            (parity anchor)
  B. balanced + xla         (production default; expected ~6e-4)
  C. balanced + pallas-bf16 (the candidate long-file flip)
Prints one JSON line. Run: python scripts/diag_flash_parity.py
Knobs: DIAG_N (files, default 24), DIAG_SEC (default 48).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nomad_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nomad_tpu.models import NomadModel, Wav2Vec2Config  # noqa: E402
from nomad_tpu.ops import cdist  # noqa: E402
from nomad_tpu.scoring.engine import EmbeddingEngine  # noqa: E402
from nomad_tpu.utils.synth import speech_like  # noqa: E402


def main():
    n = int(os.environ.get("DIAG_N", 24))
    sec = float(os.environ.get("DIAG_SEC", 48))
    half = n // 2
    waves = speech_like(n, sec, seed=13, dtype=np.int16)

    model = NomadModel(Wav2Vec2Config.base(), emb_dim=256)
    init = jax.jit(functools.partial(model.init, method=NomadModel.init_all))
    params = init(jax.random.key(0), jnp.zeros((1, 4000), jnp.float32))

    def run(tag, cfg):
        m = NomadModel(cfg, emb_dim=256)
        e = EmbeddingEngine(m, params, wire_codec="off")
        e.prewarm((sec,), counts=(n,), single=False)
        emb = e.embed_waves(list(waves))
        dm = np.asarray(cdist(emb[:half], emb[half:]))
        print(f"[diag] {tag} done", file=sys.stderr, flush=True)
        return dm

    dm_a = run("A exact+xla", Wav2Vec2Config.base())
    dm_b = run("B balanced+xla", Wav2Vec2Config.balanced())
    dm_c = run("C balanced+pallas", Wav2Vec2Config.balanced(
        attention_impl="pallas"
    ))
    out = {
        "n": n, "seconds": sec,
        "delta_balanced_xla": float(np.max(np.abs(dm_b - dm_a))),
        "delta_balanced_pallas": float(np.max(np.abs(dm_c - dm_a))),
        "delta_pallas_vs_balxla": float(np.max(np.abs(dm_c - dm_b))),
        "dm_scale": float(np.mean(np.abs(dm_a))),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
