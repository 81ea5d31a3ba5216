"""Persistent XLA compilation cache.

The BASE backbone takes tens of seconds to minutes to compile per shape
(remote-compile service), so every fresh CLI/server process used to pay a
~3-minute cold start — the same pathology the reference's serve flow has.
Enabling JAX's persistent compilation cache makes the second process-run of
any entry point warm-start from disk.

Cache location (first hit wins):
  1. ``NOMAD_TPU_CACHE_DIR`` env var
  2. ``<repo>/.nomad_tpu_cache/xla_cache`` — workspace-local, so consecutive
     runs in the same checkout warm-start even when ``~/.cache`` does not
     survive between runs (round-2 lesson: the driver environment keeps the
     workspace but not the home cache, so every driver run cold-compiled)
  3. ``~/.cache/nomad_tpu/xla_cache`` when the workspace is not writable
     (e.g. installed into site-packages)

Call :func:`enable_compilation_cache` before the first jit execution (the
API/CLI/bench/serve entry points all do). Set ``NOMAD_TPU_CACHE=0`` to
disable.

CPU-compile poisoning: a TPU-backed process still makes CPU-*device*
compiles (host-side random init under ``jax.default_device(cpu)``). Through
a remote-compile service those executables are compiled for the *service*
machine's CPU features; re-loading them from the persistent cache on a
different host risks SIGILL (round-2 bench logged the full XLA
feature-mismatch warning). Wrap such host-side compiles in
:func:`cpu_compile_bypass` so they never touch the persistent cache.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

_HOME_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "nomad_tpu", "xla_cache"
)
_enabled = False


def _workspace_dir() -> str | None:
    """Repo-local cache dir (…/repo/.nomad_tpu_cache/xla_cache) derived
    from the package location; gitignored. Returns None when the package
    is an installed distribution (site-packages) rather than a checkout —
    caches do not belong next to site-packages even when its parent
    happens to be writable."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    if not any(
        os.path.exists(os.path.join(pkg_root, marker))
        for marker in (".git", "pyproject.toml")
    ):
        return None
    return os.path.join(pkg_root, ".nomad_tpu_cache", "xla_cache")


def default_cache_dir() -> str:
    env = os.environ.get("NOMAD_TPU_CACHE_DIR")
    if env:
        return env
    ws = _workspace_dir()
    if ws is None:
        return _HOME_DIR
    try:
        os.makedirs(ws, exist_ok=True)
        # per-process probe name: concurrent startups (e.g. a bench parent
        # and its serve subprocess) racing on one fixed ".w" made the loser
        # fall back to the home cache dir and re-pay cold compiles there
        probe = os.path.join(ws, f".w{os.getpid()}")
        with open(probe, "w"):
            pass
        os.remove(probe)
        return ws
    except OSError:
        return _HOME_DIR


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently turn on the persistent compilation cache; returns the
    cache directory (None when disabled via NOMAD_TPU_CACHE=0 or on a
    CPU-only backend)."""
    global _enabled
    if os.environ.get("NOMAD_TPU_CACHE", "1") == "0":
        return None
    cache_dir = cache_dir or default_cache_dir()
    if _enabled:
        return cache_dir
    import jax

    if jax.default_backend() == "cpu":
        # CPU-only process (tests, tooling): executables cached by the
        # remote-compile service carry that machine's CPU feature set —
        # loading them here risks SIGILL and spams feature-mismatch logs.
        # The cache's value is the TPU model compiles anyway.
        return None

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything, however quick the compile — warm starts matter more
    # than cache size here
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir


import threading

_guard_lock = threading.Lock()
_guard_cv = threading.Condition(_guard_lock)
_bypass_depth = 0
_cached_compiles_inflight = 0


@contextmanager
def cached_compile_guard():
    """Mark a persistent-cache-relevant compile (engine prewarm / AOT) as
    in flight. Because :func:`cpu_compile_bypass` flips a PROCESS-GLOBAL
    config flag, a TPU compile running concurrently with an open bypass
    would silently skip the persistent cache — exactly the cold-start
    pathology the cache exists to prevent. The guard turns that silent
    ordering hazard into a loud error on whichever side arrives second."""
    global _cached_compiles_inflight
    with _guard_lock:
        if _bypass_depth > 0:
            raise RuntimeError(
                "persistent-cache-relevant compile started while "
                "cpu_compile_bypass is open: the compile would silently "
                "skip the persistent cache. Order the host-side init "
                "before any engine prewarm."
            )
        _cached_compiles_inflight += 1
    try:
        yield
    finally:
        with _guard_lock:
            _cached_compiles_inflight -= 1
            _guard_cv.notify_all()


@contextmanager
def cpu_compile_bypass():
    """Disable the persistent compilation cache for the duration of a
    host-side (CPU-device) compile inside a TPU-backed process.

    The config flag is process-global, so this context must never overlap
    a TPU compile that expects the persistent cache. Guarded compiles can
    legitimately be IN FLIGHT on background threads when a bypass opens
    (the wire codec's cold-race decode prewarm runs on a daemon thread for
    10-20 s), so the bypass WAITS for them to drain — bounded by
    ``NOMAD_BYPASS_WAIT_S`` (default 900 s, generous vs the remote
    compile service's worst case) — and only raises on timeout. The other
    direction stays loud: a guarded compile STARTING while a bypass is
    open is an ordering bug at the call site
    (:func:`cached_compile_guard` raises immediately).
    """
    global _bypass_depth
    import jax

    prev = jax.config.jax_compilation_cache_dir
    if prev is None:
        yield
        return
    timeout = float(os.environ.get("NOMAD_BYPASS_WAIT_S", 900))
    with _guard_lock:
        if _cached_compiles_inflight > 0 and not _guard_cv.wait_for(
            lambda: _cached_compiles_inflight == 0, timeout=timeout
        ):
            raise RuntimeError(
                "cpu_compile_bypass waited "
                f"{timeout:.0f}s for an in-flight persistent-cache-"
                "relevant compile that never finished: opening the bypass "
                "now would silently un-cache it. Finish prewarm before "
                "host-side CPU compiles, or drop the bypass."
            )
        _bypass_depth += 1
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        with _guard_lock:
            _bypass_depth -= 1
