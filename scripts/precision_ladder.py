#!/usr/bin/env python
"""Round-4 per-module precision ladder on the pause-heavy speech stress set.

Round 2's coarse islands (whole frontend / whole attention / whole FFN at
single-pass bf16 'default') each individually broke the 1e-3 pairwise
score budget (NOTES_ROUND2.md table: 1.14-2.21e-3). This ladder resolves
ONE level finer — which matmul inside each island carries the error, and
whether the error is layer-position dependent:

  * single-module promotions: conv encoder / feature projection / pos-conv
    / attention projections / attention scores (QK^T+AV) / fc1 / fc2,
    each alone at 'default' with everything else at parity 'high'
  * layer-range splits: the LAST k encoder layers at 'default'
    (encoder_tail_start) — error injected early is amplified by every
    later block, so the tail should tolerate cheap arithmetic the head
    can't — plus the inverse (head 'default', tail 'high') as the control
  * the best composite found gets re-measured with 5 steady repeats

Ground truth per run = the 'exact' scoring recipe (matmul_precision
'high' end to end), the parity anchor BASELINE.md budgets 1e-3 against.
Writes one JSON line per recipe to scripts/precision_ladder_results.jsonl
and a markdown table at the end; NOTES_ROUND4.md carries the conclusions.

MUST run on the real chip: CPU XLA ignores dot precision configs, so
off-TPU every recipe is bit-identical f32 (the off-TPU smoke only checks
plumbing: PLADDER_SMOKE=1).
"""

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

SMOKE = os.environ.get("PLADDER_SMOKE") == "1"
SR = 16000
SECONDS = 2.0 if SMOKE else 10.0
PAD = 40960 if SMOKE else 163840  # bucket_length(SECONDS*SR)
BATCH = 8 if SMOKE else 32
N_DEG, N_NMR = (8, 8) if SMOKE else (48, 16)
REPEATS = 1 if SMOKE else 3

LADDER = {
    # ---- parity anchor ----
    "exact_high": {},
    # ---- single-module 'default' promotions ----
    "conv_encoder_def": dict(frontend_precision="default",
                             posconv_precision="high",
                             featproj_precision="high"),
    "featproj_def": dict(featproj_precision="default"),
    "posconv_def": dict(posconv_precision="default"),
    "attn_proj_def": dict(attn_precision="default",
                          attn_score_precision="high"),
    "attn_score_def": dict(attn_score_precision="default"),
    "ffn1_def": dict(ffn1_precision="default"),
    "ffn2_def": dict(ffn2_precision="default"),
    # ---- layer-range splits (12-layer base) ----
    "tail2_def": dict(encoder_tail_start=10, encoder_tail_precision="default"),
    "tail4_def": dict(encoder_tail_start=8, encoder_tail_precision="default"),
    "tail6_def": dict(encoder_tail_start=6, encoder_tail_precision="default"),
    "tail8_def": dict(encoder_tail_start=4, encoder_tail_precision="default"),
    # control: HEAD at default, tail at high — the amplification hypothesis
    # says this must be strictly worse than the same-sized tail split
    "head4_def": dict(encoder_precision="default",
                      encoder_tail_start=4, encoder_tail_precision="high"),
    "head6_def": dict(encoder_precision="default",
                      encoder_tail_start=6, encoder_tail_precision="high"),
}

if SMOKE:
    # tiny config has 2 layers; keep only structurally valid recipes
    LADDER = {k: v for k, v in LADDER.items()
              if "encoder_tail_start" not in v}
    LADDER["tail1_def"] = dict(encoder_tail_start=1,
                               encoder_tail_precision="default")
    LADDER["head1_def"] = dict(encoder_precision="default",
                               encoder_tail_start=1,
                               encoder_tail_precision="high")


def speechish(n, seed):
    """Pause-heavy pitch-modulated harmonics — the material where round-2
    found mixed-precision error ~2.5x worse than steady tones."""
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


def run_recipe(name, kw, params, w_dev, l_dev, n_total):
    mk = Wav2Vec2Config.tiny if SMOKE else Wav2Vec2Config.base
    model = NomadModel(mk(**kw), emb_dim=16 if SMOKE else 256)
    fn = jax.jit(lambda p, w, l, m=model: m.apply(p, w, lengths=l))
    n_b = n_total // BATCH
    embs = []
    t0 = time.time()
    for b in range(n_b):
        embs.append(np.asarray(fn(params, w_dev[b*BATCH:(b+1)*BATCH],
                                  l_dev[b*BATCH:(b+1)*BATCH])))
    compile_s = time.time() - t0
    emb = np.concatenate(embs)
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.time()
        for b in range(n_b):
            r = fn(params, w_dev[b*BATCH:(b+1)*BATCH],
                   l_dev[b*BATCH:(b+1)*BATCH])
        np.asarray(r)  # readback bounds the wire (axon block_until_ready lies)
        best = min(best, time.time() - t0)
    return emb, best, compile_s


def main():
    out_path = os.path.join(os.path.dirname(__file__),
                            "precision_ladder_results.jsonl")
    waves = np.concatenate([speechish(N_DEG, 1), speechish(N_NMR, 2)])
    lengths = np.full((waves.shape[0],), int(SR * SECONDS), np.int32)
    n_total = (waves.shape[0] // BATCH) * BATCH
    waves, lengths = waves[:n_total], lengths[:n_total]
    n_deg = min(N_DEG, n_total - 1)

    mk = Wav2Vec2Config.tiny if SMOKE else Wav2Vec2Config.base
    model0 = NomadModel(mk(), emb_dim=16 if SMOKE else 256)
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
    ref_wss = None
    rows = []
    with open(out_path, "a") as sink:
        for name, kw in LADDER.items():
            emb, best, compile_s = run_recipe(
                name, kw, params, w_dev, l_dev, n_total
            )
            if ref is None:
                ref = emb
                ref_wss = n_total * SECONDS / best
                pair = avg = embd = 0.0
            else:
                embd = float(np.max(np.abs(emb - ref)))
                dm = np.asarray(cdist(emb[:n_deg], emb[n_deg:]))
                dm0 = np.asarray(cdist(ref[:n_deg], ref[n_deg:]))
                pair = float(np.max(np.abs(dm - dm0)))
                avg = float(np.max(np.abs(dm.mean(1) - dm0.mean(1))))
            wss = n_total * SECONDS / best
            row = {"recipe": name,
                   "wav_sec_per_sec": round(wss, 1),
                   "speedup_vs_exact": round(wss / ref_wss, 3),
                   "pairwise_maxdiff": pair, "avg_maxdiff": avg,
                   "emb_maxdiff": embd, "compile_s": round(compile_s, 1),
                   "in_budget": pair <= 1e-3}
            rows.append(row)
            sink.write(json.dumps(row) + "\n")
            sink.flush()
            print(json.dumps(row), flush=True)

    print("\n| recipe | wav-s/s | vs exact | pairwise err | in budget |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['recipe']} | {r['wav_sec_per_sec']} "
              f"| {r['speedup_vs_exact']}x | {r['pairwise_maxdiff']:.2e} "
              f"| {'yes' if r['in_budget'] else 'no'} |")


if __name__ == "__main__":
    main()
