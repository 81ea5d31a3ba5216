#!/usr/bin/env python
"""Round-5 follow-up diagnostics for the sustained-put collapse and the
wire-codec's end-to-end economics (VERDICT r4 weak #2 / #3).

diag_put.py (same round, earlier session) showed the engine-shaped steady
loop at 44.3 MB/s e2e over ~190 MB streamed — no collapse. Two questions
remain:

  1. LONG STREAM: BENCH_LARGE streams ~2.5 GB. If the relay meters burst
     credit (token bucket), short diagnostics ride the credit and the
     refill rate only shows after ~GBs. Phase L: DIAG_LONG_N puts
     back-to-back (readback-bounded), watch the per-put rate SERIES.
  2. PACKED E2E: in good weather the packed codec wins the wire race
     (55.2 vs 47.0 logical MB/s, BENCH_r04) yet loses end-to-end (speech
     wss 1177 vs 1323). Candidate mechanisms: (a) fused decode+forward
     executable is slower than the raw forward by more than the wire
     saving; (b) host-side encode contends with the relay for CPU in
     steady state (the race pre-encodes, so it never sees this).
     Phase F times the warm raw vs fused-packed executables on the SAME
     speech batch (isolates (a)); phase S runs the steady submit loop
     with codec forced off vs on and reports delivered wav-s/s
     (captures (a)+(b) together).

One JSON line per phase. Run on the real chip: python scripts/diag_stream.py
Knobs: DIAG_LONG_N (default 60), DIAG_N (steady batches, default 14),
DIAG_B/DIAG_T batch shape.
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
from nomad_tpu.utils.synth import speech_like  # noqa: E402


def mark(m):
    print(f"[diag] {m}", file=sys.stderr, flush=True)


def emit(k, v):
    print(json.dumps({k: v}), flush=True)


def main():
    long_n = int(os.environ.get("DIAG_LONG_N", 60))
    n = int(os.environ.get("DIAG_N", 14))
    b = int(os.environ.get("DIAG_B", 96))
    t = int(os.environ.get("DIAG_T", 163840))
    dev = jax.devices()[0]
    mb = b * t * 2 / 1e6
    emit("config", {"batch_MB": round(mb, 1), "long_n": long_n,
                    "n": n, "b": b, "t": t})

    mark("synth speech payload")
    # speech-like rows: the codec packs these ~0.55-0.6x (tone+noise is
    # incompressible and the codec correctly skips it)
    waves = speech_like(b, t / 16000, seed=11, dtype=np.int16)
    batch = np.stack(waves)
    lengths = np.full((b,), t - 3840, np.int32)

    mark("model init")
    model = NomadModel(Wav2Vec2Config.balanced(), emb_dim=256)
    init = jax.jit(functools.partial(model.init, method=NomadModel.init_all))
    params = init(jax.random.key(0), jnp.zeros((1, 4000), jnp.float32))
    engine = EmbeddingEngine(model, params, wire_codec="off")
    mark("prewarm")
    engine.prewarm((t / 16000,), single=False)
    params_dev = engine._device_params()
    aot = engine._aot[(b, t, True)]
    len_dev = jax.device_put(lengths, dev)

    # ---- Phase L: long sustained put stream (token-bucket test) ----
    mark(f"phase L: {long_n} x {mb:.0f} MB puts ({long_n * mb / 1e3:.1f} GB)")
    rng = np.random.default_rng(3)
    rates = []
    t0all = time.perf_counter()
    for i in range(long_n):
        # vary rows slightly so relay-side compression can't special-case
        bb = batch + rng.integers(-4, 4, size=(b, 1), dtype=np.int16)
        t0 = time.perf_counter()
        d = jax.device_put(bb, dev)
        np.asarray(d[:1, :1])
        rates.append(mb / (time.perf_counter() - t0))
        del d
    wall = time.perf_counter() - t0all
    emit("L_put_MBps_series", [round(r, 1) for r in rates])
    emit("L_GB_total", round(long_n * mb / 1e3, 2))
    emit("L_e2e_MBps", round(long_n * mb / wall, 1))
    emit("L_first10_MBps", round(float(np.mean(rates[:10])), 1))
    emit("L_last10_MBps", round(float(np.mean(rates[-10:])), 1))

    # ---- Phase F: warm executable timing, raw vs fused packed ----
    mark("phase F: encode + fused compile")
    from nomad_tpu.ops import wirecodec

    enc = wirecodec.encode(batch)
    if enc is None:
        emit("F_skip", "payload incompressible")
        rows = None
    else:
        enc["rows"] = wirecodec.combined_rows(enc)
        rows = enc["rows"]
        emit("F_pack_ratio", round(rows.nbytes / batch.nbytes, 3))
        fn = engine._get_fn_packed(b, t, rows.shape)
        fused = fn.lower(
            engine._params_aval(),
            jax.ShapeDtypeStruct(rows.shape, jnp.uint32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        ).compile()
        rows_dev = jax.device_put(rows, dev)
        batch_dev = jax.device_put(batch, dev)
        # warm both
        np.asarray(jnp.ravel(aot(params_dev, batch_dev, len_dev))[:1])
        np.asarray(jnp.ravel(fused(params_dev, rows_dev, len_dev))[:1])
        raw_s, fus_s = [], []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(jnp.ravel(aot(params_dev, batch_dev, len_dev))[:1])
            raw_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jnp.ravel(fused(params_dev, rows_dev, len_dev))[:1])
            fus_s.append(time.perf_counter() - t0)
        emit("F_raw_exec_s", round(min(raw_s), 3))
        emit("F_fused_exec_s", round(min(fus_s), 3))
        emit("F_decode_overhead_s", round(min(fus_s) - min(raw_s), 3))
        # host-side encode cost (the race pre-encodes; steady state pays
        # this on the assemble pool)
        enc_s = []
        for _ in range(3):
            t0 = time.perf_counter()
            e2 = wirecodec.encode(batch)
            e2["rows"] = wirecodec.combined_rows(e2)
            enc_s.append(time.perf_counter() - t0)
        emit("F_encode_host_s", round(min(enc_s), 3))

    # ---- Phase S: steady submit-loop wss, codec off vs forced packed ----
    wavsec = b * (t - 3840) / 16000

    nonlocal_fallbacks = [0]

    def steady(mode_engine, use_packed):
        outs = []
        t0all = time.perf_counter()
        for i in range(n):
            bb = batch + rng.integers(-4, 4, size=(b, 1), dtype=np.int16)
            if use_packed:
                e = wirecodec.encode(bb)
                e["rows"] = wirecodec.combined_rows(e)
                if e["rows"].shape != rows.shape:  # other pack bucket:
                    d = jax.device_put(bb, dev)   # raw fallback, count it
                    outs.append(aot(params_dev, d, len_dev))
                    nonlocal_fallbacks[0] += 1
                    continue
                pdev = jax.device_put(e["rows"], dev)
                outs.append(fused(params_dev, pdev, len_dev))
            else:
                d = jax.device_put(bb, dev)
                outs.append(aot(params_dev, d, len_dev))
        np.asarray(jnp.ravel(outs[-1])[:1])
        return n * wavsec / (time.perf_counter() - t0all)

    mark("phase S: steady raw")
    raw_wss = steady(engine, False)
    emit("S_raw_wss", round(raw_wss, 1))
    if rows is not None:
        mark("phase S: steady packed (encode inline, worst case)")
        packed_wss = steady(engine, True)
        emit("S_packed_inline_encode_wss", round(packed_wss, 1))
        emit("S_packed_raw_fallbacks", nonlocal_fallbacks[0])
        # packed with encode amortized off the critical path (thread pool,
        # like the engine's assemble pool does)
        from concurrent.futures import ThreadPoolExecutor

        mark("phase S: steady packed (encode on pool)")
        bbs = [batch + rng.integers(-4, 4, size=(b, 1), dtype=np.int16)
               for _ in range(n)]

        def enc_job(x):
            e = wirecodec.encode(x)
            e["rows"] = wirecodec.combined_rows(e)
            return e["rows"]

        outs = []
        t0all = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as ex:
            for bb, r in zip(bbs, ex.map(enc_job, bbs)):
                if r.shape != rows.shape:
                    d = jax.device_put(bb, dev)
                    outs.append(aot(params_dev, d, len_dev))
                    continue
                pdev = jax.device_put(r, dev)
                outs.append(fused(params_dev, pdev, len_dev))
        np.asarray(jnp.ravel(outs[-1])[:1])
        emit("S_packed_pool_encode_wss",
             round(n * wavsec / (time.perf_counter() - t0all), 1))

    mark("done")


if __name__ == "__main__":
    main()
