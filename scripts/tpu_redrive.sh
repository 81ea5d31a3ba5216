#!/bin/bash
# Round-4 on-chip artifact queue. Fired (once) by the relay watcher the
# moment `jax.devices()` starts answering again, or run by hand:
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
timeout 3600 python bench.py >"$REPO/BENCH_local_r04.json"
echo "--- bench rc=$? end $(date -u +%FT%TZ)"
tail -c 2000 "$REPO/BENCH_local_r04.json" 2>/dev/null
echo

# 2. precision ladder (the round-4 study; needs real MXU precision)
step ladder 7200 python scripts/precision_ladder.py

# 3. BENCH_LARGE on the speech payload (codec leg; smaller N so the
#    wall stays bounded on bad weather — 2k x 100 x 10 s = 5.6 h of audio)
step bench_large_speech 3600 env LS_PAYLOAD=speech LS_N_DEG=2000 \
  python scripts/bench_large.py
cp -f "$REPO/BENCH_LARGE.json" "$REPO/BENCH_LARGE_SPEECH.json" 2>/dev/null

# 4. TRAIN_BENCH regen (base model, self-evidencing eval)
step train_bench 3600 python scripts/train_bench.py

# 5. SE_BENCH (base model A/B: mse vs mse+nomad)
step se_bench 7200 python scripts/se_bench.py

# 6. SERVE_BENCH refresh
step serve_bench 1800 python scripts/serve_bench.py

# 7. full-size BENCH_LARGE, tone payload (comparable to r03's artifact)
step bench_large_tone 3600 python scripts/bench_large.py

echo "=== tpu_redrive done $(date -u +%FT%TZ)"
