#!/bin/bash
# On-chip artifact re-drive queue (round 5). Run by hand or by a relay
# watcher when `jax.devices()` answers:
#   bash scripts/tpu_redrive.sh
# Every step is time-boxed; bench.py additionally carries its own
# watchdog + crash-proof reporter, so a relay dying mid-queue yields
# diagnosable JSONs, not hangs. Log: /tmp/tpu_redrive.log
set -u
cd "$(dirname "$0")/.."
REPO=$(pwd)
LOG=/tmp/tpu_redrive.log
exec >>"$LOG" 2>&1
echo "=== tpu_redrive start $(date -u +%FT%TZ)"

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2
  shift 2
  echo "--- $name start $(date -u +%FT%TZ)"
  timeout "$tmo" "$@"
  echo "--- $name rc=$? end $(date -u +%FT%TZ)"
}

# 1. headline bench (driver-format JSON; stdout preserved as an artifact)
echo "--- bench start $(date -u +%FT%TZ)"
timeout 3600 python bench.py >"$REPO/BENCH_local_r05.json"
echo "--- bench rc=$? end $(date -u +%FT%TZ)"
tail -c 2000 "$REPO/BENCH_local_r05.json" 2>/dev/null
echo

# 2+3. the wire-bound flagships run inside a good-weather window: the
# relay swings 1.4-44 MB/s between sessions (NOTES_ROUND5), and a
# wire-bound artifact driven into a dead episode measures the tunnel's
# mood, not the framework (r5 measured 610.7 vs 37.8 wav-s/s on the
# SAME config 40 min apart)
step weather_gate 3900 env WEATHER_MIN_MBPS=30 python scripts/weather_gate.py
step bench_large_speech 3600 env LS_PAYLOAD=speech LS_N_DEG=2000 \
  python scripts/bench_large.py
step bench_large_tone 3600 python scripts/bench_large.py

# 4. SERVE_BENCH refresh (balanced default via serve --precision)
step serve_bench 1800 python scripts/serve_bench.py

# 5. TRAIN_BENCH (balanced default; training-sensitive eval bar)
step train_bench 3600 python scripts/train_bench.py

# 6. SE_BENCH (valid-PESQ checkpoint selection; gentler lr so the MSE
#    control arm's curve peaks above the un-enhanced input)
step se_bench 3600 python scripts/se_bench.py --lr 4e-5 --epochs 36 \
  --test-every 2 --files 256

echo "=== tpu_redrive done $(date -u +%FT%TZ)"
