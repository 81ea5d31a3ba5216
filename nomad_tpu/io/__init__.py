"""Audio ingest: decode, mono-fold, resample, trim.

Replaces the reference's ``load_processing`` (duplicated at
`/root/reference/src/nomad_audio/nomad.py:192-212` and
`src/dataloader/triplet_dataloader.py:8-28`): torchaudio.load -> average of
channels 0 and 1 when multichannel (reference quirk Q4: channels beyond the
second are dropped) -> resample to 16 kHz with torchaudio-default sinc filter
-> optional 10 s trim.
"""

from __future__ import annotations

import numpy as np

from .resample import resample, resample_jnp, sinc_resample_kernel
from .wav import (
    WavInfo,
    read_wav,
    read_wav_bytes,
    read_wav_int16_mono,
    wav_info,
    write_wav,
)

TARGET_SR = 16000


def read_audio(filepath: str) -> tuple[np.ndarray, int]:
    """Decode WAV or FLAC (by magic) -> (float32 [channels, samples], sr).

    FLAC support exceeds the reference, which needs an offline ffmpeg pass
    to consume LibriSpeech (`audio_degrader_training.py:70`, SURVEY §2.3)."""
    with open(filepath, "rb") as f:
        head = f.read(4)
    if head == b"fLaC":
        from .flac import read_flac

        return read_flac(filepath)
    return read_wav(filepath)


def load_processing(
    filepath: str,
    target_sr: int = TARGET_SR,
    trim: bool = False,
) -> np.ndarray:
    """Load a WAV/FLAC file -> float32 [1, samples] at ``target_sr``.

    Mirrors reference `nomad.py:192-212`: stereo folds to (ch0+ch1)/2,
    resample when needed, trim to 10 s when ``trim``.
    """
    wave, sr = read_audio(filepath)
    if wave.shape[0] > 1:
        wave = ((wave[0, :] + wave[1, :]) / 2.0)[None, :]
    if sr != target_sr:
        wave = resample(wave, sr, target_sr)
        sr = target_sr
    if trim and wave.shape[1] > sr * 10:
        wave = wave[:, : sr * 10]
    return np.ascontiguousarray(wave, dtype=np.float32)


def load_for_scoring(filepath: str, target_sr: int = TARGET_SR, trim: bool = False):
    """Like :func:`load_processing` but returns raw int16 [samples] for mono
    PCM16 files already at target_sr (exact, halves device-transfer bytes —
    see EmbeddingEngine); float32 [samples] otherwise."""
    try:
        fast = read_wav_int16_mono(filepath)
    except Exception:
        fast = None
    if fast is not None and fast[1] == target_sr:
        x = fast[0]
        if trim and x.shape[0] > target_sr * 10:
            x = x[: target_sr * 10]
        return x
    return load_processing(filepath, target_sr=target_sr, trim=trim)[0]


__all__ = [
    "TARGET_SR",
    "load_for_scoring",
    "read_audio",
    "read_wav_int16_mono",
    "WavInfo",
    "load_processing",
    "read_wav",
    "read_wav_bytes",
    "resample",
    "resample_jnp",
    "sinc_resample_kernel",
    "wav_info",
    "write_wav",
]
