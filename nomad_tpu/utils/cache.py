"""Persistent XLA compilation cache.

The BASE backbone takes tens of seconds to minutes to compile per shape
(remote-compile service), so every fresh CLI/server process used to pay a
~3-minute cold start — the same pathology the reference's serve flow has.
Enabling JAX's persistent compilation cache makes the second process-run of
any entry point warm-start from disk.

Call :func:`enable_compilation_cache` before the first jit execution (the
API/CLI/bench/serve entry points all do). Set ``NOMAD_TPU_CACHE_DIR`` to
relocate the cache, or ``NOMAD_TPU_CACHE=0`` to disable.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "nomad_tpu", "xla_cache"
)
_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently turn on the persistent compilation cache; returns the
    cache directory (None when disabled via NOMAD_TPU_CACHE=0)."""
    global _enabled
    if os.environ.get("NOMAD_TPU_CACHE", "1") == "0":
        return None
    cache_dir = cache_dir or os.environ.get("NOMAD_TPU_CACHE_DIR", _DEFAULT_DIR)
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
