#!/usr/bin/env python
"""Round-5 diagnostic for the put/compute overlap gap (VERDICT r4 item 8).

BENCH_local_r05: wire_ceiling 1606 wss, compute 2341, serial floor 952,
measured steady 1185 -> overlap_efficiency 0.738. A perfectly pipelined
wire-bound loop should sit at ~wire_ceiling. Where does the ~26% go?

Candidate mechanisms measured here, all on the warm (B,T) speech shape:

  A  put_only       — N device_puts, block at end: the wire ceiling.
  B  compute_only   — data-resident chained executes: the compute ceiling.
  C  steady_inline  — the engine's loop verbatim (put k, dispatch k, ...):
                      what embed_waves does today.
  D  steady_ahead   — one-put lookahead: put k+1 is issued BEFORE
                      dispatch k, so the wire never waits on the submit
                      thread being busy with dispatch bookkeeping.
  E  steady_thread  — producer thread keeps a depth-2 queue of device
                      arrays, main thread only dispatches: tests whether
                      concurrent RPC issue multiplexes better through the
                      relay than single-thread interleaving.

Per-call host-blocking time of put vs dispatch is recorded for C so the
host-side serialization (device_put submit ~0.1 s/31 MB + dispatch RPC)
is visible separately from wire/compute occupancy.

Run on the real chip: python scripts/diag_overlap.py
Knobs: DIAG_N (batches per mode, default 12), DIAG_B, DIAG_T.
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
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
from nomad_tpu.utils.synth import speech_like  # noqa: E402


def mark(m):
    print(f"[diag] {m}", file=sys.stderr, flush=True)


def emit(k, v):
    print(json.dumps({k: v}), flush=True)


def main():
    n = int(os.environ.get("DIAG_N", 12))
    b = int(os.environ.get("DIAG_B", 96))
    t = int(os.environ.get("DIAG_T", 163840))
    dev = jax.devices()[0]
    mb = b * t * 2 / 1e6
    wavsec = b * (t - 3840) / 16000
    emit("config", {"batch_MB": round(mb, 1), "n": n, "b": b, "t": t})

    mark("synth + model init")
    waves = speech_like(b, t / 16000, seed=11, dtype=np.int16)
    base = np.stack(waves)
    lengths = np.full((b,), t - 3840, np.int32)
    model = NomadModel(Wav2Vec2Config.balanced(), emb_dim=256)
    init = jax.jit(functools.partial(model.init, method=NomadModel.init_all))
    params = init(jax.random.key(0), jnp.zeros((1, 4000), jnp.float32))
    engine = EmbeddingEngine(model, params, wire_codec="off")
    mark("prewarm")
    engine.prewarm((t / 16000,), single=False)
    params_dev = engine._device_params()
    aot = engine._aot[(b, t, True)]
    len_dev = jax.device_put(lengths, dev)

    rng = np.random.default_rng(5)

    def batches(k):
        # vary rows so relay-side caching/compression can't special-case
        return [
            base + rng.integers(-4, 4, size=(b, 1), dtype=np.int16)
            for _ in range(k)
        ]

    # settle the wire: one untimed put+exec round
    d = jax.device_put(base, dev)
    jax.block_until_ready(aot(params_dev, d, len_dev))
    del d

    # ---- A: put only ----
    mark("A put_only")
    bs = batches(n)
    t0 = time.perf_counter()
    devs = [jax.device_put(x, dev) for x in bs]
    for x in devs:
        jax.block_until_ready(x)
    wall_a = time.perf_counter() - t0
    emit("A_put_only", {
        "MBps": round(n * mb / wall_a, 1),
        "wss": round(n * wavsec / wall_a, 1),
    })

    # ---- B: compute only (data resident) ----
    mark("B compute_only")
    outs = [aot(params_dev, devs[i % len(devs)], len_dev) for i in range(2)]
    for o in outs:
        jax.block_until_ready(o)  # warm path
    t0 = time.perf_counter()
    outs = [aot(params_dev, devs[i % len(devs)], len_dev) for i in range(n)]
    for o in outs:
        jax.block_until_ready(o)
    wall_b = time.perf_counter() - t0
    emit("B_compute_only", {"wss": round(n * wavsec / wall_b, 1)})
    del outs, devs

    # ---- C: steady inline (engine order: put k, dispatch k) ----
    mark("C steady_inline")
    bs = batches(n)
    put_s, disp_s = [], []
    t0 = time.perf_counter()
    pend = []
    for x in bs:
        t1 = time.perf_counter()
        d = jax.device_put(x, dev)
        t2 = time.perf_counter()
        pend.append(aot(params_dev, d, len_dev))
        t3 = time.perf_counter()
        put_s.append(t2 - t1)
        disp_s.append(t3 - t2)
    for o in pend:
        jax.block_until_ready(o)
    wall_c = time.perf_counter() - t0
    emit("C_steady_inline", {
        "wss": round(n * wavsec / wall_c, 1),
        "put_host_s_mean": round(float(np.mean(put_s)), 3),
        "put_host_s_max": round(float(np.max(put_s)), 3),
        "dispatch_host_s_mean": round(float(np.mean(disp_s)), 3),
        "dispatch_host_s_max": round(float(np.max(disp_s)), 3),
        "host_blocked_frac": round(
            float(np.sum(put_s) + np.sum(disp_s)) / wall_c, 3
        ),
    })
    del pend

    # ---- D: one-put lookahead ----
    mark("D steady_ahead")
    bs = batches(n)
    t0 = time.perf_counter()
    pend = []
    ahead = jax.device_put(bs[0], dev)
    for i in range(n):
        cur = ahead
        if i + 1 < n:
            ahead = jax.device_put(bs[i + 1], dev)
        pend.append(aot(params_dev, cur, len_dev))
    for o in pend:
        jax.block_until_ready(o)
    wall_d = time.perf_counter() - t0
    emit("D_steady_ahead", {"wss": round(n * wavsec / wall_d, 1)})
    del pend

    # ---- E: threaded producer, depth-2 queue ----
    mark("E steady_thread")
    bs = batches(n)
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def producer():
        for x in bs:
            q.put(jax.device_put(x, dev))
        q.put(None)

    t0 = time.perf_counter()
    th = threading.Thread(target=producer, daemon=True)
    th.start()
    pend = []
    while True:
        d = q.get()
        if d is None:
            break
        pend.append(aot(params_dev, d, len_dev))
    for o in pend:
        jax.block_until_ready(o)
    wall_e = time.perf_counter() - t0
    th.join()
    emit("E_steady_thread", {"wss": round(n * wavsec / wall_e, 1)})

    wire = n * wavsec / wall_a
    emit("summary", {
        "wire_wss": round(wire, 1),
        "compute_wss": round(n * wavsec / wall_b, 1),
        "inline_eff": round((n * wavsec / wall_c) / wire, 3),
        "ahead_eff": round((n * wavsec / wall_d) / wire, 3),
        "thread_eff": round((n * wavsec / wall_e) / wire, 3),
    })


if __name__ == "__main__":
    main()
