"""Offline dataset-generation drivers — equivalents of
`/root/reference/src/utils/audio_degrader_training.py` (train-set: 5
degradations x 4-5 levels per file, flac->wav conversion, loudness
normalization, degraded_data.csv + ViSQOL-format CSV) and
`audio_degrader_test.py` (intensity test set: 6 degradations incl. unseen
VORBIS/REVERB x fine-grained levels, a fresh random clean file per
condition; the reference had a latent missing-``import re`` bug at :207 —
not reproduced).

Pure-numpy degradations (noise, clip, reverb) always work; codec round
trips require ffmpeg and are skipped with a warning otherwise. Work is
fanned out over a process pool (the reference runs serially)."""

from __future__ import annotations

import os
import random
import shutil
import subprocess
import warnings
from concurrent.futures import ProcessPoolExecutor
from dataclasses import dataclass

import pandas as pd

from . import degradations as D


def flac_to_wav(in_path: str, out_path: str, sr: int = 16000):
    """LibriSpeech flac -> wav with the built-in decoder + resampler (the
    reference needed ffmpeg for this step; we don't)."""
    from ..io import load_processing, write_wav

    wave = load_processing(in_path, target_sr=sr)
    write_wav(out_path, wave, sr, bits=16)


def _ffmpeg_loudnorm_two_pass(path: str, sr: int, i=-23.0, tp=-2.0, lra=7.0):
    """The ffmpeg-normalize recipe: pass 1 measures (loudnorm print_format=
    json on a null muxer), pass 2 applies with the measured values and
    linear=true. Returns False if either pass fails."""
    import json as _json

    flt = f"loudnorm=I={i}:LRA={lra}:TP={tp}:print_format=json"
    proc = subprocess.run(
        ["ffmpeg", "-hide_banner", "-i", path, "-af", flt, "-f", "null", "-"],
        capture_output=True, text=True,
    )
    # the JSON block is the last {...} on stderr
    err = proc.stderr
    start = err.rfind("{")
    if start < 0:
        return False
    try:
        m = _json.loads(err[start : err.rfind("}") + 1])
    except ValueError:
        return False
    flt2 = (
        f"loudnorm=I={i}:LRA={lra}:TP={tp}"
        f":measured_I={m['input_i']}:measured_LRA={m['input_lra']}"
        f":measured_TP={m['input_tp']}:measured_thresh={m['input_thresh']}"
        f":offset={m['target_offset']}:linear=true"
    )
    tmp = path + ".norm.wav"
    subprocess.call(
        ["ffmpeg", "-y", "-i", path, "-af", flt2, "-ar", str(sr), tmp],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    if os.path.isfile(tmp):
        os.replace(tmp, path)
        return True
    return False


def loudness_normalize(path: str, sr: int = 16000):
    """EBU R128 two-pass normalize to I=-23 LUFS / TP=-2 dBTP — the
    ffmpeg-normalize step the reference runs on every degraded training file
    (`audio_degrader_training.py:70`). Uses ffmpeg's loudnorm (measure then
    apply, linear) when ffmpeg is present; otherwise the native BS.1770-4
    meter + linear gain (utils/loudness.py)."""
    if D.have_ffmpeg() and _ffmpeg_loudnorm_two_pass(path, sr):
        return
    from ..io import read_wav, write_wav
    from .loudness import normalize_loudness

    x, sr_x = read_wav(path)
    y, _info = normalize_loudness(x[0], sr_x)
    write_wav(path, y[None], sr_x)


@dataclass
class DegradeJob:
    kind: str  # MP3 | OPUS | NOISE | CLIP | VORBIS | REVERB
    in_path: str
    out_path: str
    level: object
    noise_path: str | None = None
    sr: int = 16000


def run_job(job: DegradeJob):
    os.makedirs(os.path.dirname(job.out_path), exist_ok=True)
    if job.kind == "MP3":
        D.mp3(job.in_path, job.out_path, bitrate=str(job.level), sr=job.sr)
    elif job.kind == "OPUS":
        D.opus(job.in_path, job.out_path, bitrate=str(job.level), sr=job.sr)
    elif job.kind == "VORBIS":
        D.vorbis(job.in_path, job.out_path, quality=str(job.level), sr=job.sr)
    elif job.kind == "NOISE":
        D.noise(job.in_path, job.noise_path, job.out_path,
                snr_db=float(job.level), sr=job.sr)
    elif job.kind == "CLIP":
        D.clip_signal(job.in_path, job.out_path, clip_factor=float(job.level),
                      sr=job.sr)
    elif job.kind == "REVERB":
        D.reverb(job.in_path, job.out_path, p=float(job.level), sr=job.sr)
    else:
        raise ValueError(job.kind)
    return job


def _out_name(in_path: str, kind: str, level) -> str:
    stem = os.path.splitext(os.path.basename(in_path))[0]
    lvl = str(level).replace("k", "k") if isinstance(level, str) else str(level)
    return f"{stem}_{kind}_{lvl}.wav"


def generate_training_set(config: dict, workers: int = 8, limit: int | None = None):
    """Walk the clean wav tree and emit the 5-degradations x train-levels
    grid (~20 conditions/file like the reference driver), normalizing each
    output; writes degraded_data.csv + a ViSQOL-format CSV."""
    root = config["root"]
    in_dir = os.path.join(root, config["in_dir_train_wav"])
    out_root = os.path.join(root, config["out_dir_train"])
    sr = int(config.get("sr", 16000))

    clean_files = []
    for dirpath, _dirs, files in os.walk(in_dir):
        clean_files += [os.path.join(dirpath, f) for f in files if f.endswith(".wav")]
    clean_files.sort()
    if limit:
        clean_files = clean_files[:limit]

    noise_files = []
    noise_dir = os.path.join(config.get("root_noise", root),
                             config.get("noise_dir_train", ""))
    if os.path.isdir(noise_dir):
        noise_files = sorted(
            os.path.join(noise_dir, f) for f in os.listdir(noise_dir)
            if f.endswith(".wav")
        )

    rng = random.Random(0)
    jobs = []
    for f in clean_files:
        grid = []
        if D.have_ffmpeg():
            grid += [("MP3", lvl) for lvl in config["mp3_train"]]
            grid += [("OPUS", lvl) for lvl in config["opus_train"]]
        grid += [("CLIP", lvl) for lvl in config["clip_train"]]
        if noise_files:
            grid += [("NOISE", lvl) for lvl in config["noise_train"]]
        for kind, lvl in grid:
            out = os.path.join(out_root, kind, _out_name(f, kind, lvl))
            jobs.append(DegradeJob(kind, f, out, lvl,
                                   noise_path=rng.choice(noise_files)
                                   if noise_files else None, sr=sr))

    rows = []
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for job in ex.map(run_job, jobs):
            loudness_normalize(job.out_path, sr)
            rows.append(
                {
                    "reference": os.path.relpath(job.in_path, in_dir),
                    "degraded": os.path.relpath(job.out_path, out_root),
                    "condition": f"{job.kind}_{job.level}",
                }
            )
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(out_root, "degraded_data.csv"), index=False)
    # ViSQOL batch format: reference,degraded absolute paths
    visqol = pd.DataFrame(
        {
            "reference": [os.path.join(in_dir, r) for r in df["reference"]],
            "degraded": [os.path.join(out_root, d) for d in df["degraded"]],
        }
    )
    visqol.to_csv(os.path.join(out_root, "visqol_batch.csv"), index=False)
    return df


def generate_intensity_test_set(config: dict, workers: int = 8,
                                seed: int = 0):
    """Fine-grained degradation-intensity set: every (degradation, level)
    condition hits ONE freshly sampled clean file (reference
    audio_degrader_test.py behavior)."""
    root = config["root"]
    in_dir = os.path.join(root, config["in_dir_test_wav"])
    out_root = os.path.join(root, config["out_dir_test"])
    sr = int(config.get("sr", 16000))

    clean_files = []
    for dirpath, _dirs, files in os.walk(in_dir):
        clean_files += [os.path.join(dirpath, f) for f in files if f.endswith(".wav")]
    if not clean_files:
        raise RuntimeError(f"no wavs under {in_dir}")
    rng = random.Random(seed)

    noise_files = []
    noise_dir = os.path.join(config.get("root_noise", root),
                             config.get("noise_dir_test", ""))
    if os.path.isdir(noise_dir):
        noise_files = sorted(
            os.path.join(noise_dir, f) for f in os.listdir(noise_dir)
            if f.endswith(".wav")
        )

    grid = []
    if D.have_ffmpeg():
        grid += [("MP3", l) for l in config["mp3_test"]]
        grid += [("OPUS", l) for l in config["opus_test"]]
        grid += [("VORBIS", l) for l in config["vorbis"]]
    grid += [("CLIP", l) for l in config["clip_test"]]
    grid += [("REVERB", l) for l in config["reverb"]]
    if noise_files:
        grid += [("NOISE", l) for l in config["noise_test"]]

    jobs = []
    for kind, lvl in grid:
        f = rng.choice(clean_files)
        out = os.path.join(out_root, kind, _out_name(f, kind, lvl))
        jobs.append(DegradeJob(kind, f, out, lvl,
                               noise_path=rng.choice(noise_files)
                               if noise_files else None, sr=sr))

    rows = []
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for job in ex.map(run_job, jobs):
            lvl = job.level
            rows.append(
                {
                    "filepath_deg": os.path.relpath(job.out_path, out_root),
                    "Degradation": job.kind,
                    "Condition": float(str(lvl).rstrip("k"))
                    if not isinstance(lvl, (int, float)) else float(lvl),
                }
            )
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(out_root, "test_degradation_intensity.csv"),
              index=False)
    return df


def copy_referenced_subset(csv_paths: list[str], src_root: str, dst_root: str):
    """librispeechdeg_subset.py equivalent: copy the CLEAN files referenced
    by the triplet CSVs into a distributable tree
    (`/root/reference/src/utils/librispeechdeg_subset.py`)."""
    names = set()
    for p in csv_paths:
        df = pd.read_csv(p)
        for col in ("Anchor", "Positive", "Negative"):
            if col in df.columns:
                names.update(x for x in df[col] if str(x).startswith("CLEAN"))
    copied = []
    for rel in sorted(names):
        src = os.path.join(src_root, rel)
        dst = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.isfile(src):
            shutil.copyfile(src, dst)
            copied.append(rel)
    return copied
