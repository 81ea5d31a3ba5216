"""Dataset degrader drivers on a miniature LibriSpeech-like tree
(reference `/root/reference/src/utils/audio_degrader_training.py` /
`audio_degrader_test.py`). Codec conditions need ffmpeg and are skipped
gracefully when the binary is absent — the numpy conditions always run."""

import os

import numpy as np
import pandas as pd
import pytest

from nomad_tpu.io import write_wav
from nomad_tpu.utils import degradations as D
from nomad_tpu.utils.degrader_drivers import (
    generate_intensity_test_set,
    generate_training_set,
)


@pytest.fixture()
def librispeech_tree(tmp_path, rng):
    root = tmp_path
    for split in ("train-clean-100-wav", "test-clean-wav"):
        d = root / split / "spk1"
        d.mkdir(parents=True)
        for i in range(2):
            w = np.clip(0.3 * rng.standard_normal(2000), -0.99, 0.99).astype(
                np.float32
            )
            write_wav(str(d / f"utt{i}.wav"), w[None], 16000, bits=16)
    noise_dir = root / "noise_train"
    noise_dir.mkdir()
    w = np.clip(0.2 * rng.standard_normal(1500), -0.99, 0.99).astype(np.float32)
    write_wav(str(noise_dir / "n0.wav"), w[None], 16000, bits=16)
    return {
        "root": str(root) + "/",
        "in_dir_train_wav": "train-clean-100-wav",
        "out_dir_train": "train-degraded",
        "in_dir_test_wav": "test-clean-wav",
        "out_dir_test": "test-degraded",
        "sr": 16000,
        "mp3_train": ["64k"],
        "opus_train": ["64k"],
        "clip_train": [10, 25],
        "noise_train": [10],
        "root_noise": str(root),
        "noise_dir_train": "noise_train",
        "noise_dir_test": "noise_train",
        "mp3_test": ["64k"],
        "opus_test": ["64k"],
        "clip_test": [10, 30],
        "noise_test": [5, 20],
        "reverb": [20, 80],
        "vorbis": ["3"],
    }


def test_generate_training_set(librispeech_tree):
    df = generate_training_set(librispeech_tree, workers=2)
    out_root = os.path.join(librispeech_tree["root"], "train-degraded")
    assert os.path.isfile(os.path.join(out_root, "degraded_data.csv"))
    assert os.path.isfile(os.path.join(out_root, "visqol_batch.csv"))
    # 2 files x (2 CLIP + 1 NOISE [+ codecs if ffmpeg])
    min_conditions = 3
    assert len(df) >= 2 * min_conditions
    assert {"reference", "degraded", "condition"} <= set(df.columns)
    for rel in df["degraded"].head(4):
        assert os.path.isfile(os.path.join(out_root, rel))
    # ViSQOL csv carries absolute path pairs
    vq = pd.read_csv(os.path.join(out_root, "visqol_batch.csv"))
    assert os.path.isabs(vq["reference"].iloc[0])


def test_generate_intensity_test_set(librispeech_tree):
    df = generate_intensity_test_set(librispeech_tree, workers=2, seed=0)
    out_root = os.path.join(librispeech_tree["root"], "test-degraded")
    # always-available conditions: 2 CLIP + 2 REVERB + 2 NOISE
    assert len(df) >= 6
    assert set(df["Degradation"]) >= {"CLIP", "REVERB", "NOISE"}
    assert df["Condition"].dtype.kind == "f"
    for rel in df["filepath_deg"].head(3):
        assert os.path.isfile(os.path.join(out_root, rel))


def test_codecs_gated_on_ffmpeg(librispeech_tree, tmp_path):
    if D.have_ffmpeg():
        pytest.skip("ffmpeg present; gate not exercised")
    with pytest.raises(RuntimeError, match="ffmpeg"):
        D.mp3(
            os.path.join(
                librispeech_tree["root"], "train-clean-100-wav/spk1/utt0.wav"
            ),
            str(tmp_path / "o.wav"),
        )
