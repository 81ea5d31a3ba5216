"""Native PESQ-WB (utils/pesq.py) property tests.

Bit-exactness against the ITU C code is unverifiable offline (no pesq
wheel, no network — documented divergence), so these tests pin the
properties that make the metric usable for the SE demo: perfect score on
identity, the P.862.2 score range, monotonicity in SNR, level/delay
invariance (the model's explicit alignment steps), sensitivity to real
distortions, and batch API compatibility with pip-pesq."""

import numpy as np
import pytest

from nomad_tpu.utils.pesq import pesq_batch, pesq_wb

SR = 16000


@pytest.fixture(scope="module")
def speech():
    """Speech-like test signal: pitch-modulated harmonics in syllable
    bursts + a touch of noise."""
    rng = np.random.default_rng(0)
    t = np.arange(SR * 6) / SR
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 3.1 * t))
    phase = np.cumsum(2 * np.pi * f0 / SR)
    x = sum(np.sin(k * phase) / k for k in range(1, 6))
    env = np.clip(np.sin(2 * np.pi * 0.7 * t), 0, 1)
    return (x * env * 0.25 + 0.001 * rng.standard_normal(t.shape)).astype(
        np.float64
    )


def _add_noise(x, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(x.shape)
    n *= np.sqrt(np.mean(x**2) / np.mean(n**2)) / 10 ** (snr_db / 20)
    return x + n


def test_identity_is_max_score(speech):
    s = pesq_wb(speech, speech)
    assert abs(s - 4.644) < 0.01  # P.862.2 map of raw 4.5


def test_score_range(speech):
    for deg in (speech, _add_noise(speech, 0), np.zeros_like(speech)):
        s = pesq_wb(speech, deg)
        assert 1.0 <= s <= 4.65


def test_monotone_in_snr(speech):
    scores = [pesq_wb(speech, _add_noise(speech, snr)) for snr in (30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    # operating-range anchors for additive white noise, consistent with
    # published PESQ-WB field data (VoiceBank-DEMAND noisy sets at SNR
    # 2.5-17.5 dB average ~1.97; PESQ judges noise in speech pauses
    # harshly): 30 dB SNR lands ~3-4, 0 dB well under 1.8
    assert 2.8 < scores[0] < 4.3  # faint but audible noise
    assert 2.0 < scores[1] < 3.2  # 20 dB SNR
    assert scores[-1] < 1.8  # heavy noise


def test_gain_invariance(speech):
    # level alignment must make a clean gain change nearly free
    assert pesq_wb(speech, speech * 0.316) > 4.5
    assert pesq_wb(speech, speech * 2.0) > 4.5


def test_delay_invariance(speech):
    # time alignment must absorb constant delay
    assert pesq_wb(speech, np.roll(speech, 80)) > 4.5  # 5 ms
    assert pesq_wb(speech, np.roll(speech, 1600)) > 4.5  # 100 ms


def test_utterance_split_alignment_recovers_delay_jump(speech):
    """P.862 §8 utterance splitting: a MID-FILE delay jump (e.g. a jitter
    buffer adapting between utterances) must not be scored as distortion.
    A single global cross-correlation can only pick one of the two delays
    — whichever utterance it sacrifices is then misaligned by 50 ms and
    the score collapses; the split alignment recovers each utterance's own
    delay and the (otherwise undistorted) score."""
    n = len(speech)
    half = n // 2
    # ref: two utterances with a real silence gap between them
    gap = int(0.4 * SR)
    ref = np.concatenate([speech[:half], np.zeros(gap), speech[half:]])
    # deg: first utterance on time, second delayed by 800 samples (50 ms)
    d = 800
    deg = ref.copy()
    deg[half + gap :] = 0.0
    deg[half + gap + d : n + gap] = ref[half + gap : n + gap - d]
    jumped = pesq_wb(ref, deg)  # default: utterance alignment
    glob = pesq_wb(ref, deg, align="global")
    assert jumped > 4.3, (jumped, glob)
    assert glob < jumped - 0.5, (jumped, glob)


def test_utterance_alignment_matches_global_on_constant_delay(speech):
    """On constant-delay material the two alignment modes must agree —
    the split machinery may not invent delay structure."""
    deg = np.roll(speech, 320)  # 20 ms constant delay
    u = pesq_wb(speech, deg)
    g = pesq_wb(speech, deg, align="global")
    assert abs(u - g) < 0.1, (u, g)
    assert u > 4.5


def test_clipping_hurts(speech):
    hard = pesq_wb(speech, np.clip(speech, -0.05, 0.05))
    soft = pesq_wb(speech, np.clip(speech, -0.15, 0.15))
    assert hard < soft < 4.3


def test_additive_noise_worse_than_mild_filter(speech):
    from scipy.signal import butter, sosfilt

    sos = butter(6, 5000 / (SR / 2), output="sos")
    filtered = pesq_wb(speech, sosfilt(sos, speech))
    noisy = pesq_wb(speech, _add_noise(speech, 10))
    assert noisy < filtered


def test_batch_api(speech):
    degs = np.stack([speech, _add_noise(speech, 15)])
    scores = pesq_batch(SR, speech, degs, mode="wb")
    assert len(scores) == 2
    assert scores[0] > scores[1]
    with pytest.raises(ValueError):
        pesq_batch(SR, speech, degs, mode="nb")


def test_se_metric_uses_native_pesq(speech):
    # the SE demo's metric hook must resolve to the native implementation
    # when the pip extension is absent
    from nomad_tpu.training.se import _try_pesq_batch

    ref = np.stack([speech[: SR * 2]])
    deg = np.stack([_add_noise(speech[: SR * 2], 20)])
    val = _try_pesq_batch(SR, ref, deg)
    assert val is not None and 1.0 <= val <= 4.65


def test_spec_constants_are_published_values():
    """The calibration constants must be the standard's published values,
    not tuned stand-ins (VERDICT r2 item 4): level-alignment target and
    listening level from P.862 §10.1.2, Zwicker exponent and Sl from the
    Annex A parameter set, masking/asymmetry/cap/aggregation constants
    from §10.2.5-10.2.8, and the P.862.2 wideband logistic map."""
    import math

    from nomad_tpu.utils import pesq as P

    assert P.TARGET_AVG_POWER == 1e7
    assert P.LISTENING_LEVEL_DB_SPL == 79.0
    assert P.ZWICKER_POWER == 0.23
    assert P.SL == 1.866055e-1
    assert P.MASK_FACTOR == 0.25
    assert (P.ASYM_CONST, P.ASYM_POW) == (50.0, 1.2)
    assert (P.ASYM_ZERO_BELOW, P.ASYM_CAP) == (3.0, 12.0)
    assert P.FRAME_D_CAP == 45.0
    assert (P.D_POW_F, P.D_POW_S, P.D_POW_T) == (2.0, 6.0, 2.0)
    assert (P.A_POW_F, P.A_POW_S, P.A_POW_T) == (1.0, 6.0, 2.0)
    assert (P.RAW_SYM_W, P.RAW_ASYM_W) == (0.1, 0.0309)
    assert P.PSQM_INTERVAL == 20
    # P.862.2 map endpoints: raw 4.5 -> 4.64..., raw -0.5 -> ~1.02
    top = 0.999 + 4.0 / (1.0 + math.exp(-1.3669 * 4.5 + 3.8224))
    assert abs(top - 4.6439) < 1e-3
    # 32 ms Hann frames, 50% overlap, 49 wideband Bark bands
    assert (P.NFFT, P.HOP, P.NB) == (512, 256, 49)


def test_pseudo_lp_matches_itu_form():
    """_weighted_lp is the reference pseudo_Lp: ((sum((|x|w)^p)/W)^(1/p))*W
    with W = sum(w). (A degenerate W^(1/p) scaling — which cancels to a
    plain unnormalized p-norm — previously hid the module's band-table
    unit offset; that offset now lives in ONE named constant at the
    d_sym call site instead.)"""
    from nomad_tpu.utils.pesq import _weighted_lp

    rng = np.random.default_rng(7)
    x = rng.standard_normal(49)
    w = np.abs(rng.standard_normal(49)) + 0.1
    for p in (1.0, 2.0, 6.0):
        itu = (np.sum((np.abs(x) * w) ** p) / np.sum(w)) ** (1.0 / p) * np.sum(w)
        assert np.isclose(_weighted_lp(x, w, p), itu)
