"""bench.py must be a crash-proof reporter: whatever kills it — a backend
init *exception* (the round-3 relay outage mode that produced a raw rc=1
traceback and a `parsed: null` driver record) or a hard *hang* in the PJRT
dial loop — stdout's last line must be ONE parseable zero-value JSON record
naming the stage that died, with a distinct return code per mode.

Replaces the reference's unguarded scoring loop as the driver-facing
entry point (`/root/reference/src/nomad_audio/nomad.py:172-183`).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, timeout=180):
    env = dict(os.environ)
    # the conftest pins JAX_PLATFORMS=cpu for the suite; the bench
    # subprocess must pick its own platform per test. PYTHONPATH is
    # dropped so the environment's axon sitecustomize (whose import-time
    # relay registration can itself block on an outage) can't leak into
    # these hermetic failure-mode tests; bench runs with cwd=REPO so the
    # package imports without it.
    env.pop("JAX_PLATFORMS", None)
    env.pop("PYTHONPATH", None)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


def _last_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout at all: {stdout!r}"
    return json.loads(lines[-1])


def test_init_exception_emits_diagnosable_json():
    """Backend-init exception (simulated with a bogus platform name) must
    yield the zero-value JSON with stage=backend_init and rc=3, not a bare
    traceback."""
    proc = _run({"BENCH_PLATFORM": "bogus", "BENCH_INIT_RETRY_S": "2"})
    assert proc.returncode == 3, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec["metric"] == "scoring_throughput"
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    assert rec["detail"]["stage"] == "backend_init"
    assert "bogus" in rec["detail"]["error"]
    # the traceback belongs on stderr, never stdout
    assert "Traceback" not in proc.stdout


def test_hang_watchdog_emits_diagnosable_json():
    """The hang mode (main thread blocked in C++, simulated via the
    BENCH_FORCE_HANG hook) must trip the deadline watchdog: zero-value
    JSON naming the deadline, rc=2."""
    proc = _run({"BENCH_FORCE_HANG": "1", "BENCH_DEADLINE": "3"}, timeout=60)
    assert proc.returncode == 2, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec["value"] == 0.0
    assert "deadline" in rec["detail"]["error"]
    assert rec["detail"]["stage"] == "forced_hang"


def test_init_hang_emits_diagnosable_json():
    """The round-4 relay mode: jax.devices() HANGS (rather than raising).
    The subprocess probe must kill the hung attempt at its timeout and,
    once the retry budget is spent, surface a diagnosable 'probe hang'
    failure — in seconds, not the 3300 s watchdog deadline."""
    proc = _run({
        "BENCH_FORCE_INIT_HANG": "1",
        "BENCH_INIT_RETRY_S": "4",
    }, timeout=120)
    assert proc.returncode == 3, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec["value"] == 0.0
    assert rec["detail"]["stage"] == "backend_init"
    assert "probe hang" in rec["detail"]["error"]
    assert "Traceback" not in proc.stdout


def test_mid_run_exception_reports_failing_stage():
    """An exception AFTER backend init (corrupt CPU-baseline cache file is
    read at the cpu_baseline stage) must still produce the JSON record and
    point at the stage that raised."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # bench reads bench_cpu_baseline.json relative to its own file; use
        # a copy of bench.py in the temp dir so the corrupt cache is seen
        with open(BENCH) as f:
            src = f.read()
        bench_copy = os.path.join(td, "bench.py")
        with open(bench_copy, "w") as f:
            f.write(src)
        with open(os.path.join(td, "bench_cpu_baseline.json"), "w") as f:
            f.write("{not json")
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["BENCH_PLATFORM"] = "cpu"
        env["PYTHONPATH"] = REPO
        proc = subprocess.run(
            [sys.executable, bench_copy],
            capture_output=True,
            text=True,
            timeout=120,
            env=env,
            cwd=td,
        )
    assert proc.returncode == 3, proc.stderr[-2000:]
    rec = _last_json_line(proc.stdout)
    assert rec["value"] == 0.0
    assert rec["detail"]["stage"] == "cpu_baseline"
