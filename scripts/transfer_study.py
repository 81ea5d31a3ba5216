#!/usr/bin/env python
"""Round-2 follow-up study: (a) error stability of the fast recipes on a
second wave set, (b) f32-act + pallas variant, (c) raw h2d bandwidth through
the relay, (d) end-to-end engine throughput (transfer included) with the
fast recipe."""

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
from nomad_tpu.scoring.engine import EmbeddingEngine  # noqa: E402

SR = 16000
SECONDS = 10.0
PAD = 163840
BATCH = 32


def synth(n, seed, pad=True):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SECONDS * SR)) / SR
    out = []
    for i in range(n):
        f0 = 80.0 + 40.0 * rng.random()
        x = 0.1 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(t.shape)
        if pad:
            row = np.zeros(PAD, np.float32)
            row[: len(t)] = x
            out.append(row)
        else:
            out.append(
                np.round(np.clip(x, -0.99, 0.99) * 32768).astype(np.int16)
            )
    return np.stack(out) if pad else out


def bw_test():
    """Raw host->device bandwidth (f32 and int16 payloads)."""
    for name, arr in (
        ("f32_64MB", np.random.default_rng(0).standard_normal((16, 1048576)).astype(np.float32)),
        ("i16_32MB", np.random.default_rng(0).integers(-100, 100, (16, 1048576)).astype(np.int16)),
    ):
        # warm
        np.asarray(jax.device_put(arr[:1]))
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            d = jax.device_put(arr)
            d.block_until_ready()
            # force completion visibility: tiny readback of a dependent value
            _ = np.asarray(jnp.sum(d[:, ::65536]))
            best = min(best, time.time() - t0)
        mb = arr.nbytes / 1e6
        print(json.dumps({"bw": name, "MB": mb, "s": round(best, 3),
                          "MBps": round(mb / best, 1)}), flush=True)


def main():
    bw_test()

    waves = np.concatenate([synth(48, 12), synth(16, 13)])
    lengths = np.full((waves.shape[0],), SR * int(SECONDS), np.int32)
    n_batches = waves.shape[0] // BATCH

    cfg0 = Wav2Vec2Config.base()
    model0 = NomadModel(cfg0, emb_dim=256)
    # host-side CPU compile in a TPU process: keep it OUT of the
    # persistent cache (cross-host CPU AOT entries SIGILL-poison it)
    with cpu_compile_bypass():
        with jax.default_device(jax.devices("cpu")[0]):
            params = model0.init(
                jax.random.key(0), jnp.zeros((1, 4000)), method=NomadModel.init_all
            )
    params = jax.device_put(jax.device_get(params))
    waves_dev = jax.device_put(waves)
    lengths_dev = jax.device_put(lengths)

    recipes = {
        "parity_high": dict(matmul_precision="high"),
        "fast_pallas": dict(frontend_precision="high", encoder_precision="default",
                            encoder_dtype=jnp.bfloat16, attention_impl="pallas"),
        "fast_f32act_pallas": dict(frontend_precision="high",
                                   encoder_precision="default",
                                   attention_impl="pallas"),
    }
    ref = None
    for name, kw in recipes.items():
        model = NomadModel(Wav2Vec2Config.base(**kw), emb_dim=256)
        fn = jax.jit(lambda p, w, l, m=model: m.apply(p, w, lengths=l))
        embs = []
        t0 = time.time()
        for b in range(n_batches):
            embs.append(np.asarray(fn(params,
                                      waves_dev[b * BATCH:(b + 1) * BATCH],
                                      lengths_dev[b * BATCH:(b + 1) * BATCH])))
        compile_s = time.time() - t0
        emb = np.concatenate(embs)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            for b in range(n_batches):
                r = fn(params, waves_dev[b * BATCH:(b + 1) * BATCH],
                       lengths_dev[b * BATCH:(b + 1) * BATCH])
            np.asarray(r)
            best = min(best, time.time() - t0)
        if ref is None:
            ref = emb
            err = s_err = 0.0
        else:
            err = float(np.max(np.abs(emb - ref)))
            s = np.mean(np.asarray(cdist(emb[:48], emb[48:])), axis=1)
            s0 = np.mean(np.asarray(cdist(ref[:48], ref[48:])), axis=1)
            s_err = float(np.max(np.abs(s - s0)))
        print(json.dumps({"recipe": name,
                          "wav_sec_per_sec": round(waves.shape[0] * SECONDS / best, 1),
                          "emb_maxdiff": err, "score_maxdiff": s_err,
                          "compile_s": round(compile_s, 1)}), flush=True)

    # end-to-end engine run (int16 waves, transfer included) with fast recipe
    for name, kw in (("engine_fast_pallas",
                      dict(frontend_precision="high", encoder_precision="default",
                           encoder_dtype=jnp.bfloat16, attention_impl="pallas")),
                     ("engine_parity_high", dict(matmul_precision="high"))):
        model = NomadModel(Wav2Vec2Config.base(**kw), emb_dim=256)
        engine = EmbeddingEngine(model, jax.device_get(params))
        deg = synth(256, 22, pad=False)
        nmr = synth(32, 23, pad=False)
        t0 = time.time()
        emb = engine.embed_waves(deg + nmr)
        dm = np.asarray(cdist(emb[:256], emb[256:]))
        warm = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            emb = engine.embed_waves(deg + nmr)
            dm = np.asarray(cdist(emb[:256], emb[256:]))
            best = min(best, time.time() - t0)
        print(json.dumps({"recipe": name,
                          "e2e_wav_sec_per_sec": round(288 * SECONDS / best, 1),
                          "warmup_s": round(warm, 1),
                          "steady_s": round(best, 3)}), flush=True)


if __name__ == "__main__":
    main()
