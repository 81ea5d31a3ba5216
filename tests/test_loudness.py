"""BS.1770-4 loudness meter + two-pass normalize (utils/loudness.py).

Anchors: the spec's own calibration point (0 dBFS 997 Hz sine reads
-3.01 LKFS), gain linearity, gating of silence, and the end-to-end
normalize-to--23 recipe the degrader drivers run per output file
(reference `audio_degrader_training.py:70` uses ffmpeg-normalize)."""

import numpy as np
import pytest

from nomad_tpu.utils import loudness as L


def sine(freq, fs, sec, amp=1.0):
    t = np.arange(int(fs * sec)) / fs
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("fs", [48000, 16000, 44100])
def test_bs1770_calibration_tone(fs):
    # BS.1770-4: a 0 dBFS 997 Hz sine on one channel reads -3.01 LKFS
    x = sine(997.0, fs, 4.0, amp=1.0)
    got = L.integrated_loudness(x, fs)
    assert abs(got - (-3.01)) < 0.1, got


def test_gain_linearity():
    fs = 16000
    x = sine(440.0, fs, 3.0, amp=0.25)
    base = L.integrated_loudness(x, fs)
    for gain_db in (-12.0, -6.0, 6.0):
        g = 10 ** (gain_db / 20)
        assert abs(L.integrated_loudness(x * g, fs) - (base + gain_db)) < 0.05


def test_silence_is_gated():
    fs = 16000
    assert L.integrated_loudness(np.zeros(fs * 2, np.float32), fs) == float("-inf")


def test_gating_ignores_silent_stretch():
    # loud tone + long silence: gating must keep the reading near the
    # tone-only loudness rather than averaging the silence in
    fs = 16000
    tone = sine(440.0, fs, 2.0, amp=0.5)
    padded = np.concatenate([tone, np.zeros(fs * 6, np.float32)])
    lt = L.integrated_loudness(tone, fs)
    lp = L.integrated_loudness(padded, fs)
    assert abs(lt - lp) < 0.4, (lt, lp)


def test_true_peak_of_sine():
    fs = 16000
    x = sine(997.0, fs, 1.0, amp=0.5)
    # amplitude 0.5 -> ~-6.02 dBTP (oversampling can only push it up a hair)
    tp = L.true_peak_db(x, fs)
    assert -6.2 < tp < -5.8, tp


def test_normalize_hits_target():
    fs = 16000
    rng = np.random.default_rng(0)
    x = (0.01 * rng.standard_normal(fs * 4)).astype(np.float32)
    y, info = L.normalize_loudness(x, fs, target_i=-23.0, target_tp=-2.0)
    assert abs(L.integrated_loudness(y, fs) - (-23.0)) < 0.2
    assert not info["tp_capped"]


def test_normalize_caps_at_true_peak():
    fs = 16000
    # very quiet but peaky: the -23 LUFS gain would clip, so TP caps it
    x = np.zeros(fs * 2, np.float32)
    x[::4000] = 0.05
    # dynamic='never' pins the round-2 linear-cap branch; the default
    # ('auto') now falls back to dynamic loudnorm like ffmpeg-normalize
    y, info = L.normalize_loudness(x, fs, target_i=-23.0, target_tp=-2.0,
                                   dynamic="never")
    assert info["tp_capped"]
    assert L.true_peak_db(y, fs) <= -1.8
    y2, info2 = L.normalize_loudness(x, fs, target_i=-23.0, target_tp=-2.0)
    assert info2["mode"] == "dynamic"
    assert L.true_peak_db(y2, fs) <= -1.8


def test_driver_normalize_native_path(tmp_path):
    # degrader_drivers.loudness_normalize without ffmpeg -> native meter
    from nomad_tpu.io import read_wav, write_wav
    from nomad_tpu.utils.degrader_drivers import loudness_normalize

    fs = 16000
    x = sine(300.0, fs, 2.0, amp=0.02)
    p = str(tmp_path / "a.wav")
    write_wav(p, x[None], fs, bits=16)
    loudness_normalize(p, fs)
    y, sr = read_wav(p)
    assert sr == fs
    got = L.integrated_loudness(y[0], fs)
    assert abs(got - (-23.0)) < 0.3, got


def test_dynamic_fallback_on_clipping_risk():
    """ffmpeg-normalize behavior (audio_degrader_training.py:70-71): when
    one linear gain cannot reach target I without passing the TP ceiling,
    fall back to dynamic (time-varying) loudnorm. The dynamic result must
    land near the integrated target while the true peak stays under the
    ceiling — exactly what the linear cap could NOT do."""
    import numpy as np

    from nomad_tpu.utils.loudness import (
        integrated_loudness,
        normalize_loudness,
        true_peak_db,
    )

    fs = 16000
    t = np.arange(fs * 6) / fs
    # quiet speech-like body with brief near-full-scale clicks: the
    # integrated loudness is LOW (needs big gain) but the peak is already
    # near 0 dBTP, so linear mode is ceiling-bound
    x = 0.01 * np.sin(2 * np.pi * 150 * t) * (1 + 0.5 * np.sin(2 * np.pi * 1.1 * t))
    x[fs::fs] = 0.9
    x = x.astype(np.float32)

    lin, lin_info = normalize_loudness(x, fs, dynamic="never")
    assert lin_info["mode"] == "linear" and lin_info["tp_capped"]
    # capped linear CANNOT reach the target
    assert integrated_loudness(lin, fs) < -23.0 - 3.0

    dyn, dyn_info = normalize_loudness(x, fs, dynamic="auto")
    assert dyn_info["mode"] == "dynamic"
    assert abs(integrated_loudness(dyn, fs) - (-23.0)) < 2.0
    assert true_peak_db(dyn, fs) <= -2.0 + 0.2


def test_dynamic_not_taken_for_normal_material():
    import numpy as np

    from nomad_tpu.utils.loudness import integrated_loudness, normalize_loudness

    fs = 16000
    t = np.arange(fs * 4) / fs
    x = (0.05 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y, info = normalize_loudness(x, fs, dynamic="auto")
    assert info["mode"] == "linear" and not info["tp_capped"]
    assert abs(integrated_loudness(y, fs) - (-23.0)) < 0.5
