"""Degradation ops + NSIM triplet sampler + dataset tooling tests."""

import os

import numpy as np
import pandas as pd
import pytest

from nomad_tpu.io import read_wav, write_wav
from nomad_tpu.utils import degradations as D
from nomad_tpu.utils.nsim_sampling import create_triplets


@pytest.fixture()
def tone_wav(tmp_path, rng):
    t = np.arange(16000) / 16000
    x = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = str(tmp_path / "tone.wav")
    write_wav(p, x[None], 16000, bits=16)
    return p, x


@pytest.fixture()
def noise_wav(tmp_path, rng):
    x = (0.1 * rng.standard_normal(4000)).astype(np.float32)
    p = str(tmp_path / "noise.wav")
    write_wav(p, x[None], 16000, bits=16)
    return p, x


def test_noise_snr(tmp_path, tone_wav, noise_wav):
    """Reference SNR semantics (degradations.py:51-65): the linear factor
    10^(dB/10) is applied to the RMS *amplitude* ratio, so the amplitude
    ratio equals 10^(dB/10) (i.e. effective power SNR is 2x the config
    value) — a reference quirk we reproduce exactly."""
    clean_p, clean = tone_wav
    noise_p, _ = noise_wav
    out = str(tmp_path / "noisy.wav")
    for snr_db in (0, 10, 20):
        y = D.noise(clean_p, noise_p, out, snr_db=snr_db)
        assert len(y) == len(clean)
        clean_dec, _ = read_wav(clean_p)
        resid = y - clean_dec[0]
        amp_ratio = np.sqrt(np.mean(clean_dec[0] ** 2)) / np.sqrt(
            np.mean(resid**2)
        )
        assert abs(10 * np.log10(amp_ratio) - snr_db) < 0.2, (snr_db, amp_ratio)


def test_noise_tiles_short_noise(tmp_path, tone_wav, rng):
    short = (0.1 * rng.standard_normal(1000)).astype(np.float32)
    p = str(tmp_path / "short_noise.wav")
    write_wav(p, short[None], 16000, bits=16)
    y = D.noise(tone_wav[0], p, str(tmp_path / "out.wav"), snr_db=10)
    assert len(y) == 16000  # tiled up


def test_clip_signal(tmp_path, tone_wav):
    out = str(tmp_path / "clipped.wav")
    x = D.clip_signal(tone_wav[0], out, clip_factor=20)
    orig, _ = read_wav(tone_wav[0])
    lo, hi = np.percentile(orig[0], [10, 90])
    assert x.max() <= hi + 1e-6
    assert x.min() >= lo - 1e-6
    y, sr = read_wav(out)
    assert sr == 16000


def test_reverb_adds_tail_energy(tmp_path, rng):
    # impulse-ish input: energy must smear into a tail
    x = np.zeros(8000, np.float32)
    x[100] = 0.8
    p = str(tmp_path / "imp.wav")
    write_wav(p, x[None], 16000, bits=16)
    out = str(tmp_path / "rev.wav")
    y = D.reverb(p, out, p=60)
    tail_orig = np.sum(x[4000:] ** 2)
    tail_rev = np.sum(y[4000:] ** 2)
    assert tail_rev > tail_orig + 1e-6
    assert np.max(np.abs(y)) <= 1.0


def _comb_loop(x, delay, feedback, damp):
    """Sample-by-sample freeverb comb (the round-1 implementation), kept as
    the oracle for the vectorized lfilter form."""
    y = np.zeros_like(x)
    buf = np.zeros(delay, x.dtype)
    store = 0.0
    idx = 0
    for i in range(len(x)):
        out = buf[idx]
        store = out * (1.0 - damp) + store * damp
        buf[idx] = x[i] + store * feedback
        y[i] = out
        idx = (idx + 1) % delay
    return y


def _allpass_loop(x, delay):
    y = np.zeros_like(x)
    buf = np.zeros(delay, x.dtype)
    idx = 0
    for i in range(len(x)):
        bufout = buf[idx]
        y[i] = -x[i] + bufout
        buf[idx] = x[i] + bufout * 0.5
        idx = (idx + 1) % delay
    return y


def test_vectorized_filters_match_sample_loop(rng):
    x = rng.standard_normal(4000).astype(np.float32) * 0.3
    for delay in (1, 7, 225, 1617):
        got = D._comb_filter(x, delay, feedback=0.84, damp=0.2)
        want = _comb_loop(x, delay, feedback=0.84, damp=0.2)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    for delay in (1, 225, 556):
        got = D._allpass_filter(x, delay)
        want = _allpass_loop(x, delay)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_reverb_speed(tmp_path):
    # the vectorized path must handle a 10 s file in well under a second
    # (the loop form took minutes)
    import time

    x = np.sin(np.arange(160000) / 40.0).astype(np.float32) * 0.5
    p = str(tmp_path / "long.wav")
    write_wav(p, x[None], 16000, bits=16)
    t0 = time.time()
    D.reverb(p, str(tmp_path / "long_rev.wav"), p=50)
    assert time.time() - t0 < 2.0


def test_reverb_intensity_monotone(tmp_path):
    x = np.zeros(6000, np.float32)
    x[50] = 0.8
    p = str(tmp_path / "i.wav")
    write_wav(p, x[None], 16000, bits=16)
    tails = []
    for perc in (10, 50, 90):
        y = D.reverb(p, str(tmp_path / f"r{perc}.wav"), p=perc)
        tails.append(float(np.sum(y[3000:] ** 2)))
    assert tails[0] < tails[1] < tails[2]


# ---------------- NSIM triplet sampling ----------------


def nsim_df():
    rows = []
    for ref in ("a.wav", "b.wav"):
        for i, nsim in enumerate([0.55, 0.7, 0.8, 0.9, 0.95]):
            rows.append(
                {"reference": ref, "degraded": f"D/{ref}_{i}.wav", "nsim": nsim}
            )
    return pd.DataFrame(rows)


def test_create_triplets_hard():
    df = nsim_df()
    out = create_triplets(df, N=3, hard_sampling=True, seed=0)
    assert set(out.columns) == {
        "Anchor", "Positive", "Negative", "anc_pos_dist", "anc_neg_dist",
    }
    assert (out["anc_pos_dist"] < out["anc_neg_dist"]).all()


def test_create_triplets_easy_margin():
    df = nsim_df()
    out = create_triplets(df, N=3, hard_sampling=False, seed=0)
    # easy sampling enforces the 0.05 margin between pos and neg distances
    assert (out["anc_neg_dist"] > out["anc_pos_dist"] + 0.05).all()


def test_create_triplets_includes_clean():
    df = nsim_df()
    out = create_triplets(df, N=5, hard_sampling=True, seed=1)
    all_files = pd.concat([out["Anchor"], out["Positive"], out["Negative"]])
    assert any(str(f).startswith("CLEAN") for f in all_files)


def test_subset_copier(tmp_path):
    from nomad_tpu.utils.degrader_drivers import copy_referenced_subset

    src = tmp_path / "src"
    (src / "CLEAN").mkdir(parents=True)
    for i in range(3):
        (src / "CLEAN" / f"f{i}.wav").write_bytes(b"x")
    csv = tmp_path / "t.csv"
    pd.DataFrame(
        {
            "Anchor": ["CLEAN/f0.wav", "OPUS/x.wav"],
            "Positive": ["CLEAN/f1.wav", "CLEAN/f1.wav"],
            "Negative": ["MP3/y.wav", "CLEAN/f2.wav"],
        }
    ).to_csv(csv, index=False)
    dst = tmp_path / "dst"
    copied = copy_referenced_subset([str(csv)], str(src), str(dst))
    assert sorted(copied) == ["CLEAN/f0.wav", "CLEAN/f1.wav", "CLEAN/f2.wav"]
    assert (dst / "CLEAN" / "f0.wav").exists()


def test_metrics_fit_and_correlation(rng):
    from nomad_tpu.utils.metrics import correlation_report, fit_order_three

    x = np.linspace(0.1, 2.0, 30)
    mos = 4.5 - 1.5 * x + 0.1 * rng.standard_normal(30)
    rep = correlation_report(x, mos)
    assert rep["SRCC"] < -0.8  # distance anti-correlates with MOS
    assert abs(rep["PCC_map"]) > 0.8
    f = fit_order_three(x, mos)
    assert np.all(np.isfinite(f(x)))
