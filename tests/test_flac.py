"""FLAC codec tests: python decoder, minimal encoder, native C++ twin, and
ingest integration (LibriSpeech-format support without ffmpeg — the
reference requires an offline ffmpeg pass, SURVEY §2.3)."""

import os

import numpy as np
import pytest

from nomad_tpu.io import load_processing, read_audio
from nomad_tpu.io.flac import FlacFormatError, decode_flac_bytes
from nomad_tpu.io.flac_encode import crc8, crc16, encode_flac, write_flac
from nomad_tpu.io import native


def speechy(n, seed=0, amp=3000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        amp * np.sin(2 * np.pi * 220 * t / 16000)
        + amp * 0.3 * np.sin(2 * np.pi * 443 * t / 16000)
        + 50 * rng.standard_normal(n)
    ).astype(np.int64)


@pytest.mark.parametrize(
    "mode", ["constant", "verbatim", "fixed0", "fixed1", "fixed2", "lpc1", "lpc2"]
)
def test_roundtrip_modes(mode):
    x = np.zeros(5000, np.int64) if mode == "constant" else speechy(10000)
    data = encode_flac(x, 16000, subframe_mode=mode if mode != "constant" else "fixed2")
    dec, sr, bits = decode_flac_bytes(data)
    assert (sr, bits) == (16000, 16)
    np.testing.assert_array_equal(dec[0], x)


def test_roundtrip_nonblock_multiple():
    """Length not a multiple of the block size (last short frame)."""
    x = speechy(4096 * 2 + 777)
    data = encode_flac(x, 16000)
    dec, *_ = decode_flac_bytes(data)
    np.testing.assert_array_equal(dec[0], x)


def test_roundtrip_stereo():
    x = speechy(9000)
    x2 = np.stack([x, (0.6 * x).astype(np.int64)])
    data = encode_flac(x2, 16000)
    dec, *_ = decode_flac_bytes(data)
    np.testing.assert_array_equal(dec, x2)


def test_bad_magic():
    with pytest.raises(FlacFormatError):
        decode_flac_bytes(b"RIFFxxxxWAVE")


def test_crc_helpers():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 known vectors
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_read_audio_dispatch(tmp_path):
    x = speechy(8000)
    p = str(tmp_path / "x.flac")
    write_flac(p, x.astype(np.float32) / 32768.0, 16000)
    wave, sr = read_audio(p)
    assert sr == 16000
    np.testing.assert_allclose(wave[0], x / 32768.0, atol=1.5 / 32768)
    lp = load_processing(p)
    assert lp.shape == (1, 8000)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_matches_python(tmp_path):
    x = speechy(20000, seed=3)
    p = str(tmp_path / "n.flac")
    with open(p, "wb") as f:
        f.write(encode_flac(x, 16000))
    py_wave, _ = read_audio(p)
    info = native.native_wav_info(p)
    assert info == (16000, 20000, 1)
    nat, sr = native.native_decode(p)
    assert sr == 16000
    np.testing.assert_array_equal(nat, py_wave[0])


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_batch_with_flac_and_wav_mixed(tmp_path):
    from nomad_tpu.io import write_wav

    x = speechy(6000, seed=4)
    pf = str(tmp_path / "m.flac")
    with open(pf, "wb") as f:
        f.write(encode_flac(x, 16000))
    w = (x / 32768.0).astype(np.float32)
    pw = str(tmp_path / "m.wav")
    write_wav(pw, w[None], 16000, bits=16)
    batch, lengths, errs = native.native_load_batch([pf, pw], pad_len=8192)
    assert (errs == 0).all()
    assert list(lengths) == [6000, 6000]
    np.testing.assert_allclose(batch[0, :6000], batch[1, :6000], atol=1.5 / 32768)


def test_flac_to_wav_no_ffmpeg(tmp_path):
    from nomad_tpu.io import read_wav
    from nomad_tpu.utils.degrader_drivers import flac_to_wav

    x = speechy(7000, seed=5)
    pf = str(tmp_path / "c.flac")
    with open(pf, "wb") as f:
        f.write(encode_flac(x, 16000))
    pw = str(tmp_path / "c.wav")
    flac_to_wav(pf, pw)
    wave, sr = read_wav(pw)
    assert sr == 16000
    np.testing.assert_allclose(wave[0], x / 32768.0, atol=2.0 / 32768)


def test_engine_scores_flac_files(tmp_path, rng):
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
        x = speechy(4000 + 800 * i, seed=i)
        p = str(tmp_path / f"s{i}.flac")
        with open(p, "wb") as f:
            f.write(encode_flac(x, 16000))
        paths.append(p)
    engine = EmbeddingEngine(model, params)
    emb = engine.embed_files(paths)
    assert emb.shape == (3, 16)
    # parity: native batched path vs python wave path
    waves = [load_processing(p)[0] for p in paths]
    emb2 = engine.embed_waves(waves)
    np.testing.assert_allclose(emb, emb2, atol=1e-5)


def test_fuzz_corrupt_streams_fail_cleanly():
    """Truncated/corrupted FLAC must raise FlacFormatError, not crash or
    loop."""
    rng = np.random.default_rng(0)
    x = speechy(5000)
    good = bytearray(encode_flac(x, 16000))
    for cut in (10, 50, len(good) // 2, len(good) - 3):
        with pytest.raises((FlacFormatError, IndexError, ValueError)):
            decode_flac_bytes(bytes(good[:cut]))
    for _ in range(10):
        bad = bytearray(good)
        for _ in range(20):
            bad[rng.integers(42, len(bad))] = rng.integers(0, 256)
        try:
            decode_flac_bytes(bytes(bad))
        except (FlacFormatError, IndexError, ValueError, MemoryError):
            pass  # clean failure is fine; silent garbage is fine too
