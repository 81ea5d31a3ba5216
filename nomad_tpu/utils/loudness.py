"""EBU R128 / ITU-R BS.1770-4 loudness measurement and two-pass
normalization, pure numpy/scipy.

The reference pipeline shells out to ``ffmpeg-normalize`` after every
degraded file it writes (`/root/reference/src/utils/audio_degrader_training.py:70`,
`audio_degrader_test.py:83`) — an EBU R128 two-pass (measure, then apply)
normalize to I=-23 LUFS, TP=-2 dBTP, LRA=7. This module provides the same
measure+apply recipe natively so dataset generation works in environments
without ffmpeg (like this one), and is also used to verify the ffmpeg path.

Implementation follows BS.1770-4:
  * K-weighting: stage-1 high-shelf (+~4 dB above ~1.5 kHz) + stage-2
    high-pass (~38 Hz), biquads designed parametrically for any sample rate
    (the spec tabulates 48 kHz coefficients; the parametric form reproduces
    them to ~1e-6).
  * Integrated loudness: mean-square over 400 ms blocks, 75% overlap,
    -0.691 dB offset, absolute gate at -70 LUFS then relative gate at
    -10 LU below the absolutely-gated mean.
  * True peak: 4x polyphase oversampling (2x for >= 96 kHz), dBTP.
"""

from __future__ import annotations

import math

import numpy as np

# BS.1770 stage-1 shelf / stage-2 high-pass design constants (the exact
# center frequencies / Q / gain that regenerate the spec's 48 kHz tables).
_SHELF_G_DB = 3.999843853973347
_SHELF_Q = 0.7071752369554196
_SHELF_FC = 1681.974450955533
_HP_Q = 0.5003270373238773
_HP_FC = 38.13547087602444

ABS_GATE_LUFS = -70.0
REL_GATE_LU = -10.0
BLOCK_SEC = 0.400
OVERLAP = 0.75


def _k_weighting_coeffs(fs: float):
    """(b1, a1, b2, a2): stage-1 shelf and stage-2 high-pass biquads."""
    # high shelf
    K = math.tan(math.pi * _SHELF_FC / fs)
    Vh = 10.0 ** (_SHELF_G_DB / 20.0)
    Vb = Vh**0.4996667741545416
    a0 = 1.0 + K / _SHELF_Q + K * K
    b1 = np.array(
        [
            (Vh + Vb * K / _SHELF_Q + K * K) / a0,
            2.0 * (K * K - Vh) / a0,
            (Vh - Vb * K / _SHELF_Q + K * K) / a0,
        ]
    )
    a1 = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / _SHELF_Q + K * K) / a0])
    # high pass
    K = math.tan(math.pi * _HP_FC / fs)
    a0 = 1.0 + K / _HP_Q + K * K
    b2 = np.array([1.0, -2.0, 1.0])
    a2 = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / _HP_Q + K * K) / a0])
    return b1, a1, b2, a2


def k_weight(x: np.ndarray, fs: float) -> np.ndarray:
    """Apply the two-stage K-weighting filter to a [C, T] or [T] signal."""
    from scipy.signal import lfilter

    b1, a1, b2, a2 = _k_weighting_coeffs(fs)
    y = lfilter(b1, a1, x.astype(np.float64), axis=-1)
    return lfilter(b2, a2, y, axis=-1)


def integrated_loudness(x: np.ndarray, fs: float) -> float:
    """Gated integrated loudness (LUFS) of a [T] mono or [C, T] signal.

    Returns -inf for silence / all-gated input.
    """
    x = np.atleast_2d(np.asarray(x, np.float64))  # [C, T]
    y = k_weight(x, fs)
    block = int(round(BLOCK_SEC * fs))
    hop = int(round(block * (1.0 - OVERLAP)))
    if y.shape[-1] < block:
        # short signal: single (partial) block, as loudnorm effectively does
        ms = np.mean(y**2, axis=-1)
    else:
        n_blocks = 1 + (y.shape[-1] - block) // hop
        idx = np.arange(block)[None, :] + hop * np.arange(n_blocks)[:, None]
        # [C, n_blocks] per-channel block mean squares
        ms = np.stack([np.mean(y[c][idx] ** 2, axis=-1) for c in range(y.shape[0])])
    # channel weights: 1.0 for L/R/C (surround weights omitted — degradation
    # pipeline audio is mono/stereo)
    z = np.sum(ms, axis=0)  # [n_blocks] (or scalar)
    z = np.atleast_1d(z)
    with np.errstate(divide="ignore"):
        lk = -0.691 + 10.0 * np.log10(z)
    keep = lk > ABS_GATE_LUFS
    if not np.any(keep):
        return float("-inf")
    rel_thresh = -0.691 + 10.0 * np.log10(np.mean(z[keep])) + REL_GATE_LU
    keep &= lk > rel_thresh
    if not np.any(keep):
        return float("-inf")
    return float(-0.691 + 10.0 * np.log10(np.mean(z[keep])))


def true_peak_db(x: np.ndarray, fs: float) -> float:
    """True peak (dBTP) via 4x polyphase oversampling (2x at >= 96 kHz)."""
    from scipy.signal import resample_poly

    x = np.atleast_2d(np.asarray(x, np.float64))
    up = 2 if fs >= 96000 else 4
    peak = 0.0
    for c in range(x.shape[0]):
        peak = max(peak, float(np.max(np.abs(resample_poly(x[c], up, 1)))))
    if peak <= 0.0:
        return float("-inf")
    return 20.0 * math.log10(peak)


def normalize_loudness(
    x: np.ndarray,
    fs: float,
    target_i: float = -23.0,
    target_tp: float = -2.0,
):
    """Two-pass linear EBU normalization: measure I and TP, apply one gain.

    Mirrors ffmpeg-normalize's linear mode: gain = target_i - measured_i,
    reduced if the gained true peak would exceed ``target_tp`` (where
    ffmpeg-normalize would fall back to dynamic loudnorm, we cap — the
    difference only appears on clipping-risk material).

    Returns (normalized, info dict).
    """
    x = np.asarray(x)
    i_in = integrated_loudness(x, fs)
    tp_in = true_peak_db(x, fs)
    if not math.isfinite(i_in):
        return x, {"input_i": i_in, "input_tp": tp_in, "gain_db": 0.0}
    gain = target_i - i_in
    capped = False
    if math.isfinite(tp_in) and tp_in + gain > target_tp:
        gain = target_tp - tp_in
        capped = True
    y = (x.astype(np.float64) * 10.0 ** (gain / 20.0)).astype(np.float32)
    return y, {
        "input_i": i_in,
        "input_tp": tp_in,
        "gain_db": gain,
        "tp_capped": capped,
    }
