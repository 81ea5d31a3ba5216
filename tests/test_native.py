"""Native C++ ingest library vs the pure-Python path (bit-level parity).

The native library is optional; these tests skip when the toolchain can't
build it."""

import os

import numpy as np
import pytest

from nomad_tpu.io import load_processing, write_wav
from nomad_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture()
def wav_files(tmp_path, rng):
    paths = []
    for i, n in enumerate([3000, 5000, 4000]):
        w = np.clip(0.3 * rng.standard_normal(n), -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / f"f{i}.wav")
        write_wav(p, w[None], 16000, bits=16)
        paths.append(p)
    return paths


def test_decode_bit_exact(wav_files):
    for p in wav_files:
        w, sr = native.native_decode(p)
        ref = load_processing(p)[0]
        assert sr == 16000
        np.testing.assert_array_equal(w, ref)


def test_stereo_fold_bit_exact(tmp_path, rng):
    w = np.clip(0.3 * rng.standard_normal((2, 2000)), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "st.wav")
    write_wav(p, w, 16000, bits=16)
    dec, _ = native.native_decode(p)
    ref = load_processing(p)[0]
    np.testing.assert_array_equal(dec, ref)


def test_load_batch_parity_and_padding(wav_files):
    batch, lengths, errs = native.native_load_batch(wav_files, pad_len=8192)
    assert (errs == 0).all()
    for i, p in enumerate(wav_files):
        ref = load_processing(p)[0]
        assert lengths[i] == len(ref)
        np.testing.assert_array_equal(batch[i, : len(ref)], ref)
        assert not batch[i, len(ref):].any()


def test_load_batch_trim(tmp_path, rng):
    w = np.clip(0.2 * rng.standard_normal(16000 * 12), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "long.wav")
    write_wav(p, w[None], 16000, bits=16)
    batch, lengths, errs = native.native_load_batch(
        [p], pad_len=16000 * 10, trim_sec=10
    )
    assert errs[0] == 0
    assert lengths[0] == 16000 * 10
    ref = load_processing(p, trim=True)[0]
    np.testing.assert_array_equal(batch[0], ref)


def test_native_resample_close_to_python(tmp_path, rng):
    w = np.clip(0.2 * rng.standard_normal(48000), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "hi.wav")
    write_wav(p, w[None], 48000, bits=16)
    batch, lengths, errs = native.native_load_batch(
        [p], pad_len=20000, expect_sr=48000
    )
    assert errs[0] == 0
    ref = load_processing(p)[0]
    assert lengths[0] == len(ref)
    np.testing.assert_allclose(batch[0, : len(ref)], ref, atol=1e-6)


def test_q16_batch_is_quantized_f32_batch(tmp_path, rng):
    """int16 loader output == PCM16-quantized f32 loader output, same
    lengths/errors — including the resample path."""
    paths = []
    for i, (n, sr) in enumerate([(48000, 48000), (20000, 48000)]):
        w = np.clip(0.2 * rng.standard_normal(n), -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / f"q{i}.wav")
        write_wav(p, w[None], sr, bits=16)
        paths.append(p)
    f32, lens_f, errs_f = native.native_load_batch(
        paths, pad_len=20000, expect_sr=48000
    )
    q16, lens_q, errs_q = native.native_load_batch(
        paths, pad_len=20000, expect_sr=48000, quantize_i16=True
    )
    assert q16.dtype == np.int16
    np.testing.assert_array_equal(lens_f, lens_q)
    np.testing.assert_array_equal(errs_f, errs_q)
    want = np.clip(np.round(f32 * 32768.0), -32768, 32767).astype(np.int16)
    # C++ uses nearbyint (banker's at .5 ties) vs numpy round-half-even —
    # identical; allow 0 tolerance
    np.testing.assert_array_equal(q16, want)


def test_engine_quantized_resample_group(tmp_path, rng):
    """Engine with quantize_transfer ships resampled files as int16; the
    embeddings match the f32 path to quantization noise."""
    import jax
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring import EmbeddingEngine

    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    paths = []
    for i in range(3):
        w = np.clip(0.2 * rng.standard_normal(24000), -0.99, 0.99).astype(
            np.float32
        )
        p = str(tmp_path / f"r{i}.wav")
        write_wav(p, w[None], 48000, bits=16)
        paths.append(p)
    eng_q = EmbeddingEngine(model, params, quantize_transfer=True)
    eng_f = EmbeddingEngine(model, params, quantize_transfer=False)
    emb_q = eng_q._embed_files_native(paths, trim=False, progress=False)
    emb_f = eng_f._embed_files_native(paths, trim=False, progress=False)
    assert emb_q is not None and emb_f is not None
    np.testing.assert_allclose(emb_q, emb_f, atol=5e-4)


def test_unexpected_rate_flags_error(tmp_path, rng):
    w = np.clip(0.2 * rng.standard_normal(8000), -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "odd.wav")
    write_wav(p, w[None], 22050, bits=16)
    batch, lengths, errs = native.native_load_batch([p], pad_len=8192)
    assert errs[0] != 0  # caller must retry in python


def test_engine_native_path_matches_python(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring import EmbeddingEngine

    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    paths = []
    for i, n in enumerate([5000, 900, 2000, 1400, 5000]):
        w = np.clip(0.3 * rng.standard_normal(n), -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / f"e{i}.wav")
        write_wav(p, w[None], 16000, bits=16)
        paths.append(p)
    engine = EmbeddingEngine(model, params)
    emb_native = engine._embed_files_native(paths, trim=False, progress=False)
    assert emb_native is not None
    emb_python = engine.embed_waves(engine.load_waves(paths))
    np.testing.assert_allclose(emb_native, emb_python, atol=1e-6)


def test_probe_and_i16_batch(tmp_path, rng):
    from nomad_tpu.io import load_processing

    paths = []
    for i, n in enumerate([2500, 1200]):
        w = np.clip(0.3 * rng.standard_normal(n), -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / f"i{i}.wav")
        write_wav(p, w[None], 16000, bits=16)
        paths.append(p)
    probe = native.native_probe(paths[0])
    assert probe == (16000, 2500, 1, 16, False, False)

    batch, lengths, errs = native.native_load_batch_i16(paths, pad_len=4096)
    assert batch.dtype == np.int16
    assert (errs == 0).all()
    for i, p in enumerate(paths):
        ref = load_processing(p)[0]
        assert lengths[i] == len(ref)
        np.testing.assert_array_equal(
            batch[i, : len(ref)].astype(np.float32) / 32768.0, ref
        )
        assert not batch[i, len(ref):].any()

    # stereo and float files are rejected (err flag), not silently wrong
    ws = np.clip(0.3 * rng.standard_normal((2, 900)), -0.99, 0.99).astype(np.float32)
    ps = str(tmp_path / "st.wav")
    write_wav(ps, ws, 16000, bits=16)
    _, _, errs2 = native.native_load_batch_i16([ps], pad_len=4096)
    assert errs2[0] != 0


def test_engine_uses_i16_group(tmp_path, rng):
    """mono PCM16 @16k files must flow through the int16 jit variant."""
    import jax
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel, Wav2Vec2Config
    from nomad_tpu.scoring import EmbeddingEngine

    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    paths = []
    for i in range(3):
        w = np.clip(0.3 * rng.standard_normal(1500), -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / f"g{i}.wav")
        write_wav(p, w[None], 16000, bits=16)
        paths.append(p)
    engine = EmbeddingEngine(model, params)
    emb = engine._embed_files_native(paths, trim=False, progress=False)
    assert emb is not None
    assert any(key[2] for key in engine._jitted)  # an int16 fn was compiled
    ref = engine.embed_waves(engine.load_waves(paths))
    np.testing.assert_allclose(emb, ref, atol=1e-6)
