"""int16 transfer fast path: exactness end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from nomad_tpu.io import load_for_scoring, load_processing, write_wav
from nomad_tpu.models import NomadModel, Wav2Vec2Config
from nomad_tpu.scoring import EmbeddingEngine


def test_load_for_scoring_int16(tmp_path, rng):
    w = np.clip(0.3 * rng.standard_normal(2000), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "m.wav")
    write_wav(p, w[None], 16000, bits=16)
    raw = load_for_scoring(p)
    assert raw.dtype == np.int16
    ref = load_processing(p)[0]
    np.testing.assert_array_equal(raw.astype(np.float32) / 32768.0, ref)


def test_load_for_scoring_fallback_f32(tmp_path, rng):
    # stereo file: fold requires float math -> f32 path
    w = np.clip(0.3 * rng.standard_normal((2, 1500)), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "s.wav")
    write_wav(p, w, 16000, bits=16)
    out = load_for_scoring(p)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, load_processing(p)[0])
    # non-16k mono also falls back (resample needs float)
    p2 = str(tmp_path / "hi.wav")
    write_wav(p2, w[:1], 48000, bits=16)
    assert load_for_scoring(p2).dtype == np.float32


def test_engine_int16_waves_match_f32(rng):
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    engine = EmbeddingEngine(model, params)
    f32_waves = [
        (np.round(np.clip(0.2 * rng.standard_normal(n), -0.99, 0.99) * 32768)
         / 32768).astype(np.float32)
        for n in [900, 1300, 700]
    ]
    i16_waves = [np.round(w * 32768).astype(np.int16) for w in f32_waves]
    e_f32 = engine.embed_waves(f32_waves)
    e_i16 = engine.embed_waves(i16_waves)
    np.testing.assert_allclose(e_i16, e_f32, atol=1e-6)


def test_engine_mixed_dtype_batch(rng):
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    engine = EmbeddingEngine(model, params)
    w_f = (0.1 * rng.standard_normal(900)).astype(np.float32)  # off-grid
    w_i = np.round(
        np.clip(0.2 * rng.standard_normal(901), -0.99, 0.99) * 32768
    ).astype(np.int16)
    emb = engine.embed_waves([w_f, w_i])
    direct_f = np.asarray(model.apply(params, jnp.asarray(w_f[None])))
    direct_i = np.asarray(
        model.apply(params, jnp.asarray(w_i[None].astype(np.float32) / 32768.0))
    )
    np.testing.assert_allclose(emb[0], direct_f[0], atol=1e-5)
    np.testing.assert_allclose(emb[1], direct_i[0], atol=1e-5)
