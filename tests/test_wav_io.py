"""WAV codec tests (reference contract: torchaudio.load float32 [-1,1],
[channels, samples] — `/root/reference/src/nomad_audio/nomad.py:196`)."""

import numpy as np
import pytest

from nomad_tpu.io import load_processing, read_wav, wav_info, write_wav
from nomad_tpu.io.wav import WavFormatError, read_wav_bytes


def test_roundtrip_pcm16(tmp_path, rng):
    wave = np.clip(rng.standard_normal((1, 1000)) * 0.3, -0.99, 0.99).astype(
        np.float32
    )
    p = str(tmp_path / "a.wav")
    write_wav(p, wave, 16000, bits=16)
    out, sr = read_wav(p)
    assert sr == 16000
    assert out.shape == (1, 1000)
    assert np.max(np.abs(out - wave)) < 1.0 / 32768 + 1e-7


def test_roundtrip_pcm32(tmp_path, rng):
    wave = np.clip(rng.standard_normal((2, 500)) * 0.3, -0.99, 0.99).astype(
        np.float32
    )
    p = str(tmp_path / "a32.wav")
    write_wav(p, wave, 44100, bits=32)
    out, sr = read_wav(p)
    assert sr == 44100
    assert out.shape == (2, 500)
    assert np.max(np.abs(out - wave)) < 1e-6


def test_pcm24_decode(tmp_path):
    # hand-build a 24-bit PCM file
    import struct

    samples = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)], np.int64)
    raw = b"".join(struct.pack("<i", int(s))[:3] for s in samples)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000 * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(raw))
    out, sr = read_wav_bytes(hdr + raw)
    assert sr == 8000
    expected = samples.astype(np.float64) / (1 << 23)
    np.testing.assert_allclose(out[0], expected, atol=1e-6)


def test_float32_decode(tmp_path):
    import struct

    data = np.array([0.5, -0.25, 1.0], np.float32).tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 16000 * 4, 4, 32)
    hdr += b"data" + struct.pack("<I", len(data))
    out, _ = read_wav_bytes(hdr + data)
    np.testing.assert_allclose(out[0], [0.5, -0.25, 1.0])


def test_bundled_demo_files_decode():
    """The repo's golden inputs: 4 NMR + 2 degraded wavs, all 16 kHz mono."""
    import os

    for d in ("/root/reference/data/nmr-data", "/root/reference/data/test-data"):
        for f in sorted(os.listdir(d)):
            wave, sr = read_wav(os.path.join(d, f))
            assert sr == 16000
            assert wave.shape[0] == 1
            assert wave.shape[1] > 16000  # > 1 s
            assert np.max(np.abs(wave)) <= 1.0


def test_stereo_mono_fold(tmp_path, rng):
    """Quirk Q4: mono fold averages channels 0 and 1 (`nomad.py:199-200`)."""
    wave = (rng.standard_normal((2, 400)) * 0.2).astype(np.float32)
    p = str(tmp_path / "st.wav")
    write_wav(p, wave, 16000, bits=32)
    out = load_processing(p)
    assert out.shape == (1, 400)
    np.testing.assert_allclose(out[0], (wave[0] + wave[1]) / 2, atol=1e-6)


def test_trim(tmp_path, rng):
    wave = (rng.standard_normal((1, 16000 * 12)) * 0.1).astype(np.float32)
    p = str(tmp_path / "long.wav")
    write_wav(p, wave, 16000, bits=16)
    out = load_processing(p, trim=True)
    assert out.shape == (1, 16000 * 10)
    out2 = load_processing(p, trim=False)
    assert out2.shape == (1, 16000 * 12)


def test_wav_info(tmp_path, rng):
    wave = (rng.standard_normal((1, 123)) * 0.1).astype(np.float32)
    p = str(tmp_path / "i.wav")
    write_wav(p, wave, 22050, bits=16)
    info = wav_info(p)
    assert info.sample_rate == 22050
    assert info.num_channels == 1
    assert info.num_frames == 123
    assert info.bits_per_sample == 16


def test_bad_file_raises(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(WavFormatError):
        read_wav(str(p))
