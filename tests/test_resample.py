"""Resampler tests (torchaudio-default sinc_interp_hann parity design —
reference resample call at `/root/reference/src/nomad_audio/nomad.py:204`)."""

import numpy as np
import pytest

from nomad_tpu.io.resample import resample, resample_jnp, sinc_resample_kernel


def test_identity():
    x = np.random.default_rng(1).standard_normal((1, 1000)).astype(np.float32)
    y = resample(x, 16000, 16000)
    np.testing.assert_array_equal(x, y)


def test_output_length_formula():
    import math

    for orig, new, n in [(48000, 16000, 48000), (44100, 16000, 44100), (8000, 16000, 4000)]:
        x = np.zeros((1, n), np.float32)
        y = resample(x, orig, new)
        assert y.shape[1] == math.ceil(new * n / orig)


@pytest.mark.parametrize("orig,new", [(48000, 16000), (8000, 16000), (44100, 16000)])
def test_sine_preserved(orig, new):
    """A tone well below both Nyquists must survive with right frequency/amp."""
    f = 440.0
    t = np.arange(int(orig * 0.5)) / orig
    x = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
    y = resample(x, orig, new)[0]
    t2 = np.arange(y.shape[0]) / new
    expected = np.sin(2 * np.pi * f * t2)
    # ignore filter-width edge transients
    m = slice(200, -200)
    err = np.max(np.abs(y[m] - expected[m]))
    assert err < 5e-3, err


def test_dc_preserved():
    x = np.full((1, 8000), 0.5, np.float32)
    y = resample(x, 48000, 16000)
    assert abs(float(np.mean(y[0, 100:-100])) - 0.5) < 1e-3


def test_high_freq_attenuated():
    """Content above the target Nyquist must be strongly attenuated."""
    orig, new = 48000, 16000
    f = 10000.0  # above 8 kHz target Nyquist
    t = np.arange(orig) / orig
    x = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
    y = resample(x, orig, new)[0]
    assert np.max(np.abs(y[500:-500])) < 0.05


def test_jnp_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    y_np = resample(x, 48000, 16000)
    y_j = np.asarray(resample_jnp(x, 48000, 16000))
    assert y_j.shape == y_np.shape
    np.testing.assert_allclose(y_j, y_np, atol=2e-5)


def test_kernel_cache_and_shape():
    k1, width, og, ng = sinc_resample_kernel(48000, 16000)
    assert (og, ng) == (3, 1)
    assert k1.shape == (1, 2 * width + og)
    k2, *_ = sinc_resample_kernel(48000, 16000)
    assert k1 is k2  # lru cached
