#!/bin/bash
# On-chip artifact re-drive queue (round 4, session 2). Run by hand or by
# a relay watcher when `jax.devices()` answers:
#   bash scripts/tpu_redrive.sh
# Landed earlier this round (kept out of the queue): precision ladder +
# composite study, TRAIN_BENCH, SE_BENCH, headline bench. Every step is
# time-boxed; bench.py additionally carries its own watchdog +
# crash-proof reporter, so a relay dying mid-queue yields diagnosable
# JSONs, not hangs. Log: /tmp/tpu_redrive.log
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
timeout 3600 python bench.py >"$REPO/BENCH_local_r04.json"
echo "--- bench rc=$? end $(date -u +%FT%TZ)"
tail -c 2000 "$REPO/BENCH_local_r04.json" 2>/dev/null
echo

# 2. BENCH_LARGE on the speech payload (cold-race fix + balanced default;
#    2k x 100 x 10 s = 5.6 h of audio keeps the wall bounded)
step bench_large_speech 3600 env LS_PAYLOAD=speech LS_N_DEG=2000 \
  python scripts/bench_large.py
cp -f "$REPO/BENCH_LARGE.json" "$REPO/BENCH_LARGE_SPEECH.json" 2>/dev/null

# 3. SERVE_BENCH refresh (balanced default)
step serve_bench 1800 python scripts/serve_bench.py

# 4. full-size BENCH_LARGE, tone payload (comparable to r03's artifact)
step bench_large_tone 3600 python scripts/bench_large.py

echo "=== tpu_redrive done $(date -u +%FT%TZ)"
