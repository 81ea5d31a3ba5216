"""Native PESQ — ITU-T P.862 perceptual speech-quality model, wideband
(P.862.2) mode, pure numpy/scipy.

Why this exists: the reference SE demo scores checkpoints with
``pesq.pesq_batch`` (`/root/reference/src/nomad_audio/nomad_loss_test.py:96-108`)
and its golden results are PESQ-WB numbers. The ``pesq`` C extension is not
installable in this environment, so this module provides the full P.862
pipeline natively:

    level align -> 100 Hz input filter -> envelope + fine time alignment ->
    Hann STFT -> Bark-band pitch powers -> frequency (partial) and gain
    compensation -> Zwicker loudness -> masked symmetric + asymmetric
    disturbance -> L6/L2 time aggregation -> raw score -> P.862.2 MOS-LQO
    logistic map.

Fidelity note (documented divergence, PARITY.md): the official P.862 C
implementation's band tables and calibration constants are not reproduced
bit-exactly here (and cannot be verified offline — no pesq wheel, no
network). Structure, exponents, masking/asymmetry rules, aggregation norms
and the wideband output map follow the standard; absolute calibration was
tuned on synthetic conditions to land in the published operating ranges
(identical -> 4.64, heavy noise -> ~1). Treat scores as PESQ-compatible,
not PESQ-bit-exact.
"""

from __future__ import annotations

import math

import numpy as np

SR = 16000
NFFT = 512
HOP = 256
NB = 49  # Bark bands for wideband mode
F_LO = 100.0  # wideband input high-pass / first band edge
F_HI = 8000.0

# P.862 model constants
MASK_FACTOR = 0.25  # fraction of min loudness masked away
ASYM_CONST = 50.0
ASYM_POW = 1.2
ASYM_ZERO_BELOW = 3.0
ASYM_CAP = 12.0
FRAME_D_CAP = 45.0
PSQM_INTERVAL = 20  # frames per split-second interval
P_FRAME = 6.0  # Lp within interval
P_INTERVAL = 2.0  # Lp across intervals
RAW_SYM_W = 0.1
RAW_ASYM_W = 0.0309

# calibration (see module docstring): active-speech RMS target after level
# alignment, and the SPL offset mapping unit amplitude to dB SPL
TARGET_RMS = 0.05
SPL_AT_UNIT = 90.0
# Zwicker Sl, tuned on synthetic conditions (scripts in
# tests/test_pesq.py): white noise at SNR 30/20/10/0 dB scores
# ~4.3/2.7/1.7/1.3, matching published PESQ-WB operating ranges
LOUDNESS_SCALE = 0.3


def _bark(f):
    return 7.0 * np.arcsinh(np.asarray(f, np.float64) / 650.0)


def _inv_bark(z):
    return 650.0 * np.sinh(np.asarray(z, np.float64) / 7.0)


def _band_layout():
    """49 equal-Bark bands spanning 100..8000 Hz: (lo, hi, center) in Hz."""
    z = np.linspace(_bark(F_LO), _bark(F_HI), NB + 1)
    lo = _inv_bark(z[:-1])
    hi = _inv_bark(z[1:])
    fc = _inv_bark(0.5 * (z[:-1] + z[1:]))
    return lo, hi, fc


_LO, _HI, _FC = _band_layout()
_BAND_WIDTH_BARK = (_bark(F_HI) - _bark(F_LO)) / NB


def _abs_threshold_db(f):
    """Threshold in quiet (dB SPL), Terhardt's approximation."""
    khz = np.asarray(f, np.float64) / 1000.0
    return (
        3.64 * khz**-0.8
        - 6.5 * np.exp(-0.6 * (khz - 3.3) ** 2)
        + 1e-3 * khz**4
    )


# per-band absolute threshold as *power* in the internal unit system:
# amplitude-1 sine == SPL_AT_UNIT dB SPL == power 0.5
_TQ_POWER = 0.5 * 10.0 ** ((_abs_threshold_db(_FC) - SPL_AT_UNIT) / 10.0)


def _highpass_100(x):
    from scipy.signal import butter, sosfilt

    sos = butter(4, F_LO / (SR / 2), btype="high", output="sos")
    return sosfilt(sos, x.astype(np.float64))


def _active_rms(x, frame=256, thresh_ratio=1e-3):
    """RMS over frames whose energy is within 30 dB of the loudest frame
    (simple P.56-style activity gate)."""
    n = (len(x) // frame) * frame
    if n == 0:
        return float(np.sqrt(np.mean(x**2) + 1e-20))
    e = np.mean(x[:n].reshape(-1, frame) ** 2, axis=1)
    gate = np.max(e) * thresh_ratio
    act = e[e > gate]
    if len(act) == 0:
        return float(np.sqrt(np.mean(x**2) + 1e-20))
    return float(np.sqrt(np.mean(act)))


def _align(ref, deg, max_delay=SR // 2):
    """Global delay estimate (samples deg lags ref) by full-length FFT
    cross-correlation, restricted to +-max_delay."""
    n = min(len(ref), len(deg))
    a = ref[:n]
    b = deg[:n]
    if not (np.any(a) and np.any(b)):
        return 0
    m = 1 << int(math.ceil(math.log2(2 * n)))
    fa = np.fft.rfft(a, m)
    fb = np.fft.rfft(b, m)
    c = np.fft.irfft(fb * np.conj(fa), m)
    # lag d (deg lags ref by d) lives at index d (mod m)
    lags = np.concatenate([np.arange(0, max_delay + 1), np.arange(-max_delay, 0)])
    vals = np.concatenate([c[: max_delay + 1], c[-max_delay:]])
    return int(lags[int(np.argmax(vals))])


def _bark_powers(x):
    """[T, NB] per-frame Bark-band powers (Hann STFT, 50% overlap)."""
    n_frames = 1 + max(0, (len(x) - NFFT)) // HOP
    w = np.hanning(NFFT)
    wnorm = np.sum(w**2)
    idx = np.arange(NFFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * w
    spec = np.fft.rfft(frames, axis=1)
    psd = (np.abs(spec) ** 2) / wnorm  # power per bin
    freqs = np.fft.rfftfreq(NFFT, 1.0 / SR)
    bands = np.zeros((n_frames, NB))
    for b in range(NB):
        sel = (freqs >= _LO[b]) & (freqs < _HI[b])
        if not np.any(sel):  # narrow low band: take the nearest bin
            sel = np.argmin(np.abs(freqs - _FC[b]))
            bands[:, b] = psd[:, sel]
        else:
            bands[:, b] = np.sum(psd[:, sel], axis=1)
    return bands


def _loudness(bands):
    """Zwicker intensity->loudness per band: S = Sl*((0.5 + 0.5*P/Tq)^0.23
    - 1), 0 below threshold. (P.862's extra (Tq/0.5)^0.23 prefactor assumes
    the ITU internal power calibration; in this unit system it is absorbed
    into LOUDNESS_SCALE.)"""
    tq = _TQ_POWER[None, :]
    ratio = bands / tq
    s = LOUDNESS_SCALE * ((0.5 + 0.5 * ratio) ** 0.23 - 1.0)
    return np.where(bands > tq, s, 0.0)


def _lp(x, p, axis=None):
    return (np.mean(np.abs(x) ** p, axis=axis)) ** (1.0 / p)


def pesq_wb(ref, deg, sr: int = SR) -> float:
    """PESQ MOS-LQO, wideband mode, for 1-D float waveforms in [-1, 1]."""
    ref = np.asarray(ref, np.float64).ravel()
    deg = np.asarray(deg, np.float64).ravel()
    if sr != SR:
        from ..io.resample import resample as _resample

        ref = _resample(ref.astype(np.float32), sr, SR).astype(np.float64)
        deg = _resample(deg.astype(np.float32), sr, SR).astype(np.float64)

    ref = _highpass_100(ref - np.mean(ref))
    deg = _highpass_100(deg - np.mean(deg))

    # level alignment to the common internal level
    ref *= TARGET_RMS / (_active_rms(ref) + 1e-20)
    deg *= TARGET_RMS / (_active_rms(deg) + 1e-20)

    # time alignment
    d = _align(ref, deg)
    if d >= 0:
        ref_a, deg_a = ref[: len(ref) - 0], deg[d:]
        ref_a = ref_a[: len(deg_a)]
        deg_a = deg_a[: len(ref_a)]
    else:
        ref_a = ref[-d:]
        deg_a = deg[: len(ref_a)]
        ref_a = ref_a[: len(deg_a)]
    if len(ref_a) < NFFT:
        return 1.0

    br = _bark_powers(ref_a)
    bd = _bark_powers(deg_a)
    t = min(len(br), len(bd))
    br, bd = br[:t], bd[:t]

    # speech-active frames of the reference (within 40 dB of loudest frame)
    pf = np.sum(br, axis=1)
    active = pf > (np.max(pf) * 1e-4 + 1e-30)
    if not np.any(active):
        return 1.0

    # partial frequency-response compensation: per-band mean ratio over
    # active frames, clipped to +-20 dB, applied to the reference
    num = np.sum(bd[active], axis=0) + 1e3 * _TQ_POWER
    den = np.sum(br[active], axis=0) + 1e3 * _TQ_POWER
    # +-10 dB: enough for any codec/filter response; combined with the
    # short-term gain bounds it must NOT be able to forgive near-silence
    freq_comp = np.clip(num / den, 0.1, 10.0)
    br_eq = br * freq_comp[None, :]

    # short-term gain compensation: per-frame ratio, first-order smoothed,
    # bounded to [0.2, 5] and applied to the DEGRADED side (dividing deg by
    # the deg/ref ratio). For gain wobble this matches compensating the
    # reference; for dropouts/silence it cannot manufacture agreement (a
    # zeroed degraded frame stays zero while the reference stays audible).
    c = 1e2 * np.sum(_TQ_POWER)
    g_raw = (np.sum(bd, axis=1) + c) / (np.sum(br_eq, axis=1) + c)
    g_raw = np.clip(g_raw, 0.2, 5.0)
    g = np.empty_like(g_raw)
    acc = 1.0
    for i in range(t):
        acc = 0.8 * acc + 0.2 * g_raw[i]
        g[i] = acc
    bd_eq = bd / g[:, None]

    lr = _loudness(br_eq)
    ld = _loudness(bd_eq)

    # masked disturbance
    diff = ld - lr
    mask = MASK_FACTOR * np.minimum(ld, lr)
    dist = np.sign(diff) * np.maximum(np.abs(diff) - mask, 0.0)

    # asymmetry factor per cell (added distortion weighs more); the
    # stabilizing constant rides the per-band threshold (ITU's flat +50 is
    # in its internal calibrated power units)
    asym_c = ASYM_CONST * _TQ_POWER[None, :]
    h = ((bd_eq + asym_c) / (br_eq + asym_c)) ** ASYM_POW
    h = np.where(h < ASYM_ZERO_BELOW, 0.0, np.minimum(h, ASYM_CAP))

    w = np.full(NB, _BAND_WIDTH_BARK)
    wsum = np.sum(w)
    # frame-level symmetric (weighted L2) and asymmetric (weighted L1)
    d_sym = np.sqrt(np.sum((dist * w) ** 2, axis=1) / wsum) * math.sqrt(NB)
    d_asym = np.sum(np.abs(dist) * h * w, axis=1)

    # de-emphasize quiet-reference frames (audible-power weighting)
    audible = np.sum(np.maximum(br_eq - _TQ_POWER[None, :], 0.0), axis=1)
    wf = ((audible + 1e-5) / (np.max(audible) + 1e-5)) ** 0.04
    d_sym = np.minimum(d_sym * wf, FRAME_D_CAP)
    d_asym = np.minimum(d_asym * wf, FRAME_D_CAP)

    # L6 over each PSQM interval, then L2 across intervals
    def aggregate(x):
        n_int = max(1, int(math.ceil(len(x) / PSQM_INTERVAL)))
        vals = []
        for i in range(n_int):
            seg = x[i * PSQM_INTERVAL : (i + 1) * PSQM_INTERVAL]
            if len(seg):
                vals.append(_lp(seg, P_FRAME))
        return _lp(np.asarray(vals), P_INTERVAL)

    dsym_t = aggregate(d_sym)
    dasym_t = aggregate(d_asym)

    raw = 4.5 - RAW_SYM_W * dsym_t - RAW_ASYM_W * dasym_t
    raw = float(np.clip(raw, -0.5, 4.5))
    # P.862.2 wideband logistic map
    return 0.999 + 4.0 / (1.0 + math.exp(-1.3669 * raw + 3.8224))


def pesq_batch(fs, ref, deg, mode: str = "wb", **_kw):
    """pip-pesq compatible batch wrapper (mode 'wb' only)."""
    if mode != "wb":
        raise ValueError("native PESQ implements wideband ('wb') mode only")
    ref = np.atleast_2d(np.asarray(ref))
    deg = np.atleast_2d(np.asarray(deg))
    if ref.shape[0] == 1 and deg.shape[0] > 1:
        ref = np.repeat(ref, deg.shape[0], axis=0)
    return [pesq_wb(r, d, sr=fs) for r, d in zip(ref, deg)]
