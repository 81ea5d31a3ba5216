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
