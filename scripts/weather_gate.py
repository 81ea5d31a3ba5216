#!/usr/bin/env python
"""Block until the relay wire sustains a target put rate, then exit 0.

The axon relay's h2d rate swings 1.4-44 MB/s session to session (round-5
measurements: the same 2k x 100 large-scale config measured 610.7, 37.8
and 403.0 wav-s/s within 90 minutes purely on wire weather). Wire-bound
flagship artifacts should be driven inside a good-weather window; this
gate measures a real readback-bounded put every RETRY_S seconds and
returns when WEATHER_MIN_MBPS (default 30) is sustained twice in a row.

Usage: python scripts/weather_gate.py && python scripts/bench_large.py
Env: WEATHER_MIN_MBPS, WEATHER_RETRY_S (default 45), WEATHER_MAX_WAIT_S
(default 3600 — exits 1 if never reached so callers can decide).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main() -> int:
    target = float(os.environ.get("WEATHER_MIN_MBPS", 30))
    retry = float(os.environ.get("WEATHER_RETRY_S", 45))
    max_wait = float(os.environ.get("WEATHER_MAX_WAIT_S", 3600))

    import jax

    dev = jax.devices()[0]
    payload = np.random.default_rng(0).integers(
        -3000, 3000, size=(8, 1 << 20), dtype=np.int16
    )  # 16 MB, noise-like (the relay can't compress it away)
    mb = payload.nbytes / 1e6
    t_start = time.time()
    good = 0
    while True:
        t0 = time.perf_counter()
        d = jax.device_put(payload, dev)
        np.asarray(d[:1, :1])
        rate = mb / (time.perf_counter() - t0)
        del d
        good = good + 1 if rate >= target else 0
        print(f"[weather] {rate:.1f} MB/s (target {target}, streak {good})",
              flush=True)
        if good >= 2:
            return 0
        if time.time() - t_start > max_wait:
            print("[weather] max wait exceeded", flush=True)
            return 1
        time.sleep(retry)


if __name__ == "__main__":
    sys.exit(main())
