#!/usr/bin/env python
"""Serving-mode benchmark: request latency through the persistent
JSON-lines service (nomad_tpu/serve.py) on the real chip.

The reference has no serving mode — its CLI reloads ~400 MB and
recompiles per invocation (reference nomad.py:36-80), so its per-request
floor IS its cold start. This measures what the warm service delivers:

  * score_cold_s    — first `score` request (embeds NMR pool + deg files)
  * score_warm_s    — same request again (embedding cache: no forwards)
  * score_new_file_s— one NEW deg file against the cached NMR pool
  * embed_one_s     — single-file `embed` request (batch-1 forward + wire)
  * ping_ms         — protocol round trip without any model work

Writes SERVE_BENCH.json. Run: python scripts/serve_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth(seconds: float, seed: int, sr: int = 16000) -> np.ndarray:
    from nomad_tpu.utils.synth import speech_like

    return speech_like(1, seconds, sr=sr, seed=seed, dtype=np.float32)[0]


def request(proc, req: dict) -> tuple[dict, float]:
    t0 = time.perf_counter()
    proc.stdin.write(json.dumps(req) + "\n")
    proc.stdin.flush()
    line = proc.stdout.readline()
    dt = time.perf_counter() - t0
    return json.loads(line), dt


def main():
    from nomad_tpu.io import write_wav

    # smoke knobs: SERVE_BENCH_MODEL=tiny SERVE_BENCH_SECONDS=1
    # NOMAD_TPU_PLATFORM=cpu exercises the full protocol off-TPU
    model = os.environ.get("SERVE_BENCH_MODEL", "base")
    secs = float(os.environ.get("SERVE_BENCH_SECONDS", 10))

    td = tempfile.mkdtemp(prefix="serve_bench_")
    nmr, deg = os.path.join(td, "nmr"), os.path.join(td, "deg")
    os.makedirs(nmr), os.makedirs(deg)
    for i in range(2):
        write_wav(os.path.join(nmr, f"ref{i}.wav"), synth(secs, i)[None],
                  16000, bits=16)
    for i in range(8):
        write_wav(os.path.join(deg, f"deg{i}.wav"), synth(secs, 10 + i)[None],
                  16000, bits=16)
    newfile = os.path.join(td, "late.wav")
    write_wav(newfile, synth(secs, 99)[None], 16000, bits=16)
    newfile2 = os.path.join(td, "late2.wav")
    write_wav(newfile2, synth(secs, 101)[None], 16000, bits=16)

    t_start = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-m", "nomad_tpu.serve", "--model", model,
         "--warm", str(secs)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, cwd=REPO,
    )
    try:
        _, ping1 = request(proc, {"op": "ping"})  # blocks until init+warm done
        startup_s = time.time() - t_start
        _, ping2 = request(proc, {"op": "ping"})

        # absorb the relay's one-time d2h channel setup HERE (a background
        # warm starts at engine construction, but on slow-wire days it can
        # still be mid-setup — measured 36-267 s, worse on bad weather).
        # Without this probe the cost lands inside score_cold and the
        # artifact conflates wire weather with serving logic.
        _, first_touch = request(proc, {"op": "embed", "paths": [newfile]})

        _, cold = request(proc, {"op": "score", "nmr": nmr, "deg": deg,
                                 "results_path": None})
        _, warm = request(proc, {"op": "score", "nmr": nmr, "deg": deg,
                                 "results_path": None})
        # one new file against the warm NMR pool: the realistic
        # "score this incoming file" serving latency
        write_wav(os.path.join(deg, "deg8.wav"),
                  np.asarray(np.clip(synth(secs, 200), -0.99, 0.99))[None],
                  16000, bits=16)
        _, newf = request(proc, {"op": "score", "nmr": nmr, "deg": deg,
                                 "results_path": None})
        _, embed1 = request(proc, {"op": "embed", "paths": [newfile2]})
        stats, _ = request(proc, {"op": "stats"})
        request(proc, {"op": "shutdown"})
    finally:
        try:
            proc.stdin.close()
        except Exception:
            pass
        proc.wait(timeout=60)

    result = {
        "metric": "serve_request_latency",
        "detail": {
            "startup_with_warm_s": round(startup_s, 2),
            "ping_ms": round(ping2 * 1e3, 1),
            # one-time d2h channel setup + first batch-1 forward; relay
            # weather, not serving logic (36-267+ s measured spread)
            "first_touch_s": round(first_touch, 2),
            "score_cold_s": round(cold, 2),
            "score_warm_s": round(warm, 3),
            "score_new_file_s": round(newf, 3),
            "embed_one_s": round(embed1, 3),
            "n_nmr": 2,
            "n_deg": 8,
            "precision": stats.get("precision"),
            "codec_cold_races": (stats.get("transfer") or {}).get(
                "codec_cold_races"
            ),
            "codec_in_use": (stats.get("transfer") or {}).get("codec_in_use"),
            "embed_cache": stats.get("embed_cache"),
            # engine span totals (submit/collect/native_ingest): shows
            # where request wall time went, separating wire from compute
            "spans": {
                k: v for k, v in (stats.get("stats") or {}).items()
                if k.startswith("engine.")
            },
            # the reference's equivalent of every request is its full cold
            # start (model load + per-file forward loop); see BASELINE.md
        },
    }
    # smoke configs must not overwrite the chip artifact
    smoke = model != "base" or os.environ.get("NOMAD_TPU_PLATFORM")
    out = os.path.join(
        REPO, "SERVE_BENCH_SMOKE.json" if smoke else "SERVE_BENCH.json"
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
