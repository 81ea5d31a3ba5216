#!/usr/bin/env python
"""Round-2 precision study, part 2: speech-like material (pause-heavy,
pitch-modulated harmonics) where mixed-precision error is ~2.5x worse than
on steady tones (found in round-2 verification). Hunts a recipe with max
PAIRWISE score delta <= 1e-3 at better-than-parity speed, with the new
attention/FFN precision split."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nomad_tpu.utils.cache import (cpu_compile_bypass,
                                   enable_compilation_cache)  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nomad_tpu.models import NomadModel, Wav2Vec2Config  # noqa: E402
from nomad_tpu.ops import cdist  # noqa: E402

SR = 16000
SECONDS = 10.0
PAD = 163840
BATCH = 32
N_DEG, N_NMR = 48, 16

RECIPES = {
    # name: config kwargs (matmul_precision defaults to 'high')
    "exact_ref": {},
    "fast_enc_default": dict(frontend_precision="high",
                             encoder_precision="default"),
    "attn_high_ffn_def": dict(frontend_precision="high",
                              attn_precision="high",
                              ffn_precision="default"),
    "ffn_high_attn_def": dict(frontend_precision="high",
                              attn_precision="default",
                              ffn_precision="high"),
    "front_highest_enc_def": dict(frontend_precision="highest",
                                  encoder_precision="default"),
    "enc_def_front_def": dict(frontend_precision="default",
                              encoder_precision="high"),
}


def speechish(n, seed):
    out = np.zeros((n, PAD), np.float32)
    for i in range(n):
        r = np.random.default_rng(seed * 1000 + i)
        t = np.arange(int(SR * SECONDS)) / SR
        f0 = 90 + 80 * r.random()
        ph = np.cumsum(2 * np.pi * f0 * (1 + 0.08 * np.sin(2 * np.pi * 2.7 * t)) / SR)
        x = sum(np.sin(k * ph) / k for k in range(1, 5))
        env = np.clip(np.sin(2 * np.pi * (0.6 + 0.6 * r.random()) * t
                             + 6 * r.random()), 0, 1)
        out[i, : len(t)] = (0.2 * x * env
                            + 0.01 * r.standard_normal(t.shape)).astype(np.float32)
    return out


def main():
    waves = np.concatenate([speechish(N_DEG, 1), speechish(N_NMR, 2)])
    lengths = np.full((waves.shape[0],), int(SR * SECONDS), np.int32)
    n_b = waves.shape[0] // BATCH

    model0 = NomadModel(Wav2Vec2Config.base(), emb_dim=256)
    # host-side CPU compile in a TPU process: keep it OUT of the
    # persistent cache (cross-host CPU AOT entries SIGILL-poison it)
    with cpu_compile_bypass():
        with jax.default_device(jax.devices("cpu")[0]):
            params = model0.init(
                jax.random.key(0), jnp.zeros((1, 4000)), method=NomadModel.init_all
            )
    params = jax.device_put(jax.device_get(params))
    w_dev = jax.device_put(waves)
    l_dev = jax.device_put(lengths)

    ref = None
    rows = []
    for name, kw in RECIPES.items():
        model = NomadModel(Wav2Vec2Config.base(**kw), emb_dim=256)
        fn = jax.jit(lambda p, w, l, m=model: m.apply(p, w, lengths=l))
        embs = []
        t0 = time.time()
        for b in range(n_b):
            embs.append(np.asarray(fn(params, w_dev[b*BATCH:(b+1)*BATCH],
                                      l_dev[b*BATCH:(b+1)*BATCH])))
        compile_s = time.time() - t0
        emb = np.concatenate(embs)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            for b in range(n_b):
                r = fn(params, w_dev[b*BATCH:(b+1)*BATCH],
                       l_dev[b*BATCH:(b+1)*BATCH])
            np.asarray(r)
            best = min(best, time.time() - t0)
        if ref is None:
            ref = emb
            pair = avg = embd = 0.0
        else:
            embd = float(np.max(np.abs(emb - ref)))
            dm = np.asarray(cdist(emb[:N_DEG], emb[N_DEG:]))
            dm0 = np.asarray(cdist(ref[:N_DEG], ref[N_DEG:]))
            pair = float(np.max(np.abs(dm - dm0)))
            avg = float(np.max(np.abs(dm.mean(1) - dm0.mean(1))))
        row = {"recipe": name,
               "wav_sec_per_sec": round(waves.shape[0]*SECONDS/best, 1),
               "pairwise_maxdiff": pair, "avg_maxdiff": avg,
               "emb_maxdiff": embd, "compile_s": round(compile_s, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| recipe | wav-s/s | pairwise err | avg err |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['recipe']} | {r['wav_sec_per_sec']} "
              f"| {r['pairwise_maxdiff']:.2e} | {r['avg_maxdiff']:.2e} |")


if __name__ == "__main__":
    main()
