"""Persistent-compilation-cache policy: workspace-local default location
and the CPU-compile bypass that keeps service-machine CPU executables out
of the cache (the round-2 driver bench logged XLA's feature-mismatch /
SIGILL warning from exactly that poisoning path)."""

import os

import jax
import pytest

from nomad_tpu.utils import cache as cache_mod


def test_default_cache_dir_is_workspace_local(monkeypatch):
    monkeypatch.delenv("NOMAD_TPU_CACHE_DIR", raising=False)
    d = cache_mod.default_cache_dir()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert d == os.path.join(repo, ".nomad_tpu_cache", "xla_cache")


def test_cache_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("NOMAD_TPU_CACHE_DIR", str(tmp_path / "x"))
    assert cache_mod.default_cache_dir() == str(tmp_path / "x")


def test_enable_disabled_on_cpu_backend():
    # test processes run CPU-only (conftest pins jax_platforms=cpu): the
    # persistent cache must stay off — remote-compiled CPU executables
    # carry the service machine's CPU features
    assert jax.default_backend() == "cpu"
    assert cache_mod.enable_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir is None


def test_cpu_compile_bypass_restores_dir(tmp_path):
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        with cache_mod.cpu_compile_bypass():
            assert jax.config.jax_compilation_cache_dir is None
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_cpu_compile_bypass_noop_when_cache_off():
    assert jax.config.jax_compilation_cache_dir is None
    with cache_mod.cpu_compile_bypass():
        assert jax.config.jax_compilation_cache_dir is None
    assert jax.config.jax_compilation_cache_dir is None


def test_bypass_waits_for_inflight_compile(tmp_path, monkeypatch):
    """Opening cpu_compile_bypass while a persistent-cache-relevant compile
    is in flight must WAIT for it to drain (advisor r4: the wire codec's
    cold-race decode prewarm holds the guard for 10-20 s on a daemon
    thread, and the bypass used to crash unrelated main-thread init), and
    raise only on timeout."""
    import threading
    import time

    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        release = threading.Event()
        entered = threading.Event()

        def hold_guard():
            with cache_mod.cached_compile_guard():
                entered.set()
                release.wait(10)

        th = threading.Thread(target=hold_guard, daemon=True)
        th.start()
        assert entered.wait(5)
        # schedule the release shortly after the bypass starts waiting
        threading.Timer(0.2, release.set).start()
        t0 = time.time()
        with cache_mod.cpu_compile_bypass():
            # the bypass only opened after the guard drained
            assert time.time() - t0 >= 0.15
            assert jax.config.jax_compilation_cache_dir is None
        th.join(5)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)

        # timeout path: a guard that never drains raises loudly
        release2 = threading.Event()
        entered2 = threading.Event()

        def hold_guard2():
            with cache_mod.cached_compile_guard():
                entered2.set()
                release2.wait(10)

        th2 = threading.Thread(target=hold_guard2, daemon=True)
        th2.start()
        assert entered2.wait(5)
        monkeypatch.setenv("NOMAD_BYPASS_WAIT_S", "0.2")
        with pytest.raises(RuntimeError, match="never finished"):
            with cache_mod.cpu_compile_bypass():
                pass  # pragma: no cover
        release2.set()
        th2.join(5)
        # guard released: bypass works again
        with cache_mod.cpu_compile_bypass():
            assert jax.config.jax_compilation_cache_dir is None
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_guarded_compile_during_open_bypass_fails_loudly(tmp_path):
    """The reverse ordering: a prewarm compile starting while the bypass is
    open would silently skip the cache — the guard raises instead."""
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    try:
        with cache_mod.cpu_compile_bypass():
            with pytest.raises(RuntimeError, match="bypass"):
                with cache_mod.cached_compile_guard():
                    pass  # pragma: no cover
        # both released: the guard admits compiles again
        with cache_mod.cached_compile_guard():
            pass
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_prewarm_compiles_ride_the_guard(monkeypatch):
    """Engine prewarm's AOT compiles must run inside cached_compile_guard
    so the ordering contract is enforced, not conventional."""
    from contextlib import contextmanager

    import numpy as np

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring.engine import EmbeddingEngine

    entered = {"n": 0}

    @contextmanager
    def spy():
        entered["n"] += 1
        yield

    monkeypatch.setattr(cache_mod, "cached_compile_guard", spy)
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), np.zeros((1, 4000), np.float32),
        method=NomadModel.init_all,
    )
    eng = EmbeddingEngine(model, params)
    eng.prewarm((0.25,), counts=(2,), single=False)
    assert entered["n"] >= 1


def test_init_params_runs_under_bypass(monkeypatch):
    """The host-side random init (a CPU-device compile even in a TPU
    process) must execute inside cpu_compile_bypass (VERDICT r2 item 2)."""
    from contextlib import contextmanager

    from nomad_tpu.api import Nomad
    from nomad_tpu.models import Wav2Vec2Config

    entered = {}

    @contextmanager
    def spy():
        entered["yes"] = True
        yield

    monkeypatch.setattr(cache_mod, "cpu_compile_bypass", spy)
    n = Nomad(config=Wav2Vec2Config.tiny(), emb_dim=16)
    params = n._init_params()
    assert entered.get("yes")
    assert "params" in params
