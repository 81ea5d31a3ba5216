#!/usr/bin/env python
"""Diagnose the sustained-put collapse (VERDICT r4 weak #2).

BENCH_LARGE r4 spans: `engine.put.wire_single` sustained 11.1 MB/s over
85 puts while `_probe_put` (which DRAINS the device queue first) banked
47.1 MB/s on the same wire, same run. Two mechanisms could produce that:

  A. relay burst-vs-sustained (token bucket): short probe bursts after a
     drain ride burst credit; continuous multi-GB streaming falls to the
     refill rate. Test: back-to-back readback-bounded puts with NO
     compute — watch per-put rates decay (or not).
  B. H2D contention with queued compute: the submit loop races ~100
     batches ahead of the device; if the relay/device serializes or
     throttles H2D while compute executes, every steady put pays it.
     Test: same puts with a forward dispatched after each, unbounded
     queue depth vs depth capped at 1-2.

Writes one JSON line per phase. Run on the real chip:
    python scripts/diag_put.py
Knobs: DIAG_N (puts per phase, default 12), DIAG_B/DIAG_T (batch shape).
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

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nomad_tpu.models import NomadModel, Wav2Vec2Config  # noqa: E402
from nomad_tpu.scoring.engine import EmbeddingEngine  # noqa: E402


def synth_batches(n, b, t, seed):
    rng = np.random.default_rng(seed)
    out = []
    tt = np.arange(t) / 16000
    for i in range(n):
        f0 = 80 + 40 * rng.random()
        x = 0.1 * np.sin(2 * np.pi * f0 * tt) + 0.02 * rng.standard_normal(t)
        row = np.round(np.clip(x, -0.99, 0.99) * 32768).astype(np.int16)
        batch = np.tile(row, (b, 1))
        # decorrelate rows a little so nothing collapses in relay-side
        # compression in a way a real batch wouldn't
        batch += rng.integers(-8, 8, size=(b, 1), dtype=np.int16)
        out.append(batch)
    return out


def main():
    n = int(os.environ.get("DIAG_N", 12))
    b = int(os.environ.get("DIAG_B", 96))
    t = int(os.environ.get("DIAG_T", 163840))
    dev = jax.devices()[0]
    mb = b * t * 2 / 1e6

    def mark(m):
        print(f"[diag] {m}", file=sys.stderr, flush=True)

    mark("model init")
    model = NomadModel(Wav2Vec2Config.balanced(), emb_dim=256)
    init = jax.jit(functools.partial(model.init, method=NomadModel.init_all))
    params = init(jax.random.key(0), jnp.zeros((1, 4000), jnp.float32))
    engine = EmbeddingEngine(model, params, wire_codec="off")
    mark("prewarm")
    engine.prewarm((t / 16000,), single=False)
    mark("prewarm done")
    params_dev = engine._device_params()
    aot = engine._aot[(b, t, True)]
    lengths = np.full((b,), t - 3840, np.int32)
    len_dev = jax.device_put(lengths, dev)

    batches = synth_batches(n, b, t, 7)
    report = {"batch_MB": round(mb, 1), "n": n, "b": b, "t": t}
    print(json.dumps(report), flush=True)

    def emit(k, v):
        report[k] = v
        print(json.dumps({k: v}), flush=True)

    def drain(x):
        np.asarray(jnp.ravel(x)[:1])

    # warm one put + one forward so nothing below compiles
    mark("warm put")
    d0 = jax.device_put(batches[0], dev)
    mark("warm forward")
    out0 = aot(params_dev, d0, len_dev)
    mark("warm drain (first d2h)")
    drain(out0)
    mark("warm done")

    # Phase A: back-to-back puts, readback-bounded, no compute.
    rates = []
    for i in range(n):
        t0 = time.perf_counter()
        d = jax.device_put(batches[i], dev)
        np.asarray(d[:1, :1])
        rates.append(mb / (time.perf_counter() - t0))
    emit("A_put_only_MBps", [round(r, 1) for r in rates])

    # Phase A2: same but NO readback between puts (pure submit side) —
    # tells us whether device_put itself host-blocks for the wire time.
    ds, call_s = [], []
    t0all = time.perf_counter()
    for i in range(n):
        t0 = time.perf_counter()
        ds.append(jax.device_put(batches[i], dev))
        call_s.append(time.perf_counter() - t0)
    np.asarray(ds[-1][:1, :1])  # bound the last; earlier ones precede it
    total = time.perf_counter() - t0all
    emit("A2_call_s", [round(s, 3) for s in call_s])
    emit("A2_stream_MBps", round(n * mb / total, 1))
    del ds

    # Phase B: put + dispatch each iter, queue unbounded (the BENCH_LARGE
    # submit-loop shape). Per-put time measured around device_put+readback
    # exactly like the engine's wire span.
    rates, outs = [], []
    t0all = time.perf_counter()
    for i in range(n):
        t0 = time.perf_counter()
        d = jax.device_put(batches[i], dev)
        np.asarray(d[:1, :1])
        rates.append(mb / (time.perf_counter() - t0))
        outs.append(aot(params_dev, d, len_dev))
    drain(outs[-1])
    wall_b = time.perf_counter() - t0all
    emit("B_put_with_queued_compute_MBps", [round(r, 1) for r in rates])
    emit("B_wall_s", round(wall_b, 2))
    emit("B_e2e_MBps", round(n * mb / wall_b, 1))
    outs = None

    # Phase C: depth-1 — drain the previous forward before the next put.
    rates = []
    prev = None
    t0all = time.perf_counter()
    for i in range(n):
        if prev is not None:
            drain(prev)
        t0 = time.perf_counter()
        d = jax.device_put(batches[i], dev)
        np.asarray(d[:1, :1])
        rates.append(mb / (time.perf_counter() - t0))
        prev = aot(params_dev, d, len_dev)
    drain(prev)
    wall_c = time.perf_counter() - t0all
    emit("C_put_depth1_MBps", [round(r, 1) for r in rates])
    emit("C_wall_s", round(wall_c, 2))
    emit("C_e2e_MBps", round(n * mb / wall_c, 1))

    # Phase D: put WITHOUT the per-put readback, dispatch each iter —
    # the engine's actual steady loop (its wire span has no readback
    # either; device_put may or may not host-block through the relay).
    t0all = time.perf_counter()
    call_s = []
    last = None
    for i in range(n):
        t0 = time.perf_counter()
        d = jax.device_put(batches[i], dev)
        call_s.append(time.perf_counter() - t0)
        last = aot(params_dev, d, len_dev)
    drain(last)
    wall_d = time.perf_counter() - t0all
    emit("D_call_s", [round(s, 3) for s in call_s])
    emit("D_wall_s", round(wall_d, 2))
    emit("D_e2e_MBps", round(n * mb / wall_d, 1))
    emit("D_e2e_wavsps", round(n * b * (t - 3840) / 16000 / wall_d, 1))

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
