"""main.py dispatcher end-to-end: YAML -> Training experiment (tiny model)
— the reference L6 entry path (`/root/reference/main.py:6-44`)."""

import os

import numpy as np
import pandas as pd
import pytest
import yaml
from click.testing import CliRunner

from nomad_tpu.io import write_wav


@pytest.fixture()
def train_yaml(tmp_path, rng):
    root = tmp_path / "degraded"
    for kind in ("OPUS", "MP3", "NOISE"):
        (root / kind).mkdir(parents=True)
    rows = []
    for i in range(4):
        for kind in ("OPUS", "MP3", "NOISE"):
            w = (0.2 * rng.standard_normal(900)).astype(np.float32)
            write_wav(str(root / kind / f"f{i}.wav"), w[None], 16000, bits=16)
        rows.append(
            {"db": 1, "Anchor": f"OPUS/f{i}.wav", "Positive": f"MP3/f{i}.wav",
             "Negative": f"NOISE/f{i}.wav", "anc_pos_dist": 0.1,
             "anc_neg_dist": 0.3}
        )
    csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    config = {
        "experiment_name": "Training",
        # reference-style module path: must be aliased to ours
        "training_script": "src.training.train_triplet",
        "out_dir": "disp-test",
        "root": str(root) + "/",
        "train_df": str(csv),
        "valid_df": str(csv),
        "train_bs": 2,
        "val_bs": 2,
        "lr": 1e-3,
        "lr_decay_factor": 0.9,
        "lr_decay_step": 30,
        "num_epochs": 1,
        "num_workers": 2,
        "emb_dim": 16,
        "patience": 5,
        "margin": 0.2,
        "freeze_convnet": True,
        "freeze_all": False,
        "current_level": [1],
        "trim": True,
        "eval_w2v": False,
        "model_size": "tiny",
        "run_dir": str(tmp_path / "run"),
    }
    path = tmp_path / "cfg.yaml"
    with open(path, "w") as f:
        yaml.dump(config, f)
    return str(path), str(tmp_path / "run")


def test_dispatch_training(train_yaml, monkeypatch, tmp_path):
    from main import training

    cfg_path, run_dir = train_yaml
    monkeypatch.chdir(tmp_path)
    res = CliRunner().invoke(training, ["--config_file", cfg_path])
    assert res.exit_code == 0, res.output
    assert os.path.isfile(os.path.join(run_dir, "best_model.npz"))
    assert os.path.isfile(os.path.join(run_dir, "config.yaml"))


def test_dispatch_unknown_experiment(tmp_path):
    from main import training

    cfg = {"experiment_name": "banana",
           "training_script": "nomad_tpu.training.triplet",
           "model_size": "tiny"}
    p = tmp_path / "c.yaml"
    with open(p, "w") as f:
        yaml.dump(cfg, f)
    res = CliRunner().invoke(training, ["--config_file", str(p)])
    assert res.exit_code == 0  # prints a warning, does not crash


def test_dispatch_se(tmp_path, rng, monkeypatch):
    """SE branch of the dispatcher (reference test_nomad_loss.yaml path)."""
    import nomad_tpu.api as api
    from main import training

    base = tmp_path
    for split in ("train", "valid", "test"):
        nd = base / f"noisy_{split}"
        cd = base / f"clean_{split}"
        nd.mkdir()
        cd.mkdir()
        for i in range(2):
            clean = (0.2 * rng.standard_normal(18000)).astype(np.float32)
            write_wav(str(cd / f"p{i}.wav"), clean[None], 16000, bits=16)
            write_wav(str(nd / f"p{i}.wav"),
                      (clean + 0.02 * rng.standard_normal(18000)
                       .astype(np.float32))[None], 16000, bits=16)
    config = {
        "experiment_name": "Test pip",
        "training_script": "src.nomad_audio.nomad_loss_test",  # aliased
        "noisy_train_dir": str(base / "noisy_train"),
        "clean_train_dir": str(base / "clean_train"),
        "noisy_valid_dir": str(base / "noisy_valid"),
        "clean_valid_dir": str(base / "clean_valid"),
        "noisy_test_dir": str(base / "noisy_test"),
        "clean_test_dir": str(base / "clean_test"),
        "train_bs": 2, "valid_bs": 2, "test_bs": 2,
        "lr": 1e-3, "nomad_weight": 0.001, "target_sr": 16000,
        "patience": 3, "num_epochs": 1, "test_every": 5,
        "n_layers": 3, "model_size": "tiny",
    }
    p = base / "se.yaml"
    with open(p, "w") as f:
        yaml.dump(config, f)
    monkeypatch.chdir(tmp_path)
    api._singleton = None
    try:
        res = CliRunner().invoke(training, ["--config_file", str(p)])
        assert res.exit_code == 0, res.output
    finally:
        api._singleton = None
