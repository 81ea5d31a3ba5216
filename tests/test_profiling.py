"""Profiling subsystem tests (an upgrade over the reference, which has no
tracing at all — SURVEY §5.1)."""

import time

from nomad_tpu.utils.profiling import Stopwatch, report, timed


def test_stopwatch_spans():
    sw = Stopwatch()
    with sw.span("a", items=10, nbytes=1000):
        time.sleep(0.01)
    with sw.span("a", items=5):
        pass
    with sw.span("b"):
        pass
    stats = sw.stats()
    assert stats["a"]["count"] == 2
    assert stats["a"]["total_s"] >= 0.01
    assert stats["a"]["items_per_s"] > 0
    assert "b" in stats
    text = sw.report()
    assert "a" in text and "count" in text
    sw.reset()
    assert sw.stats() == {}


def test_global_timed_and_engine_spans(rng):
    import jax
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring import EmbeddingEngine
    from nomad_tpu.utils import profiling

    profiling.GLOBAL.reset()
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    waves = [(0.1 * rng.standard_normal(900)).astype("float32") for _ in range(3)]
    EmbeddingEngine(model, params).embed_waves(waves)
    stats = profiling.GLOBAL.stats()
    assert "engine.submit" in stats
    assert "engine.collect" in stats
    assert report()
