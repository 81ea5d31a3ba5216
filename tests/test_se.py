"""Speech-enhancement demo end-to-end on tiny data + tiny NOMAD
(reference: `/root/reference/src/nomad_audio/nomad_loss_test.py`)."""

import os

import numpy as np
import pytest

from nomad_tpu.io import write_wav
from nomad_tpu.models import Wav2Vec2Config
from nomad_tpu.training.se import SpeechEnhancement, si_sdr


@pytest.fixture(scope="module")
def se_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("valentini")
    rng = np.random.default_rng(0)
    dirs = {}
    for split in ("train", "valid", "test"):
        nd = base / f"noisy_{split}"
        cd = base / f"clean_{split}"
        nd.mkdir()
        cd.mkdir()
        for i in range(4):
            clean = (0.3 * np.sin(2 * np.pi * (150 + 30 * i) *
                                  np.arange(20000) / 16000)).astype(np.float32)
            noisy = clean + 0.05 * rng.standard_normal(20000).astype(np.float32)
            write_wav(str(cd / f"p{i}.wav"), clean[None], 16000, bits=16)
            write_wav(str(nd / f"p{i}.wav"), noisy[None], 16000, bits=16)
        dirs[split] = (str(nd), str(cd))
    return dirs


@pytest.fixture(scope="module")
def tiny_nomad():
    from nomad_tpu.api import Nomad

    cfg = Wav2Vec2Config.tiny()
    import jax
    import jax.numpy as jnp

    from nomad_tpu.models import NomadModel

    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    return Nomad(config=cfg, emb_dim=16, params=params)


def se_config(se_dirs, **overrides):
    cfg = {
        "noisy_train_dir": se_dirs["train"][0],
        "clean_train_dir": se_dirs["train"][1],
        "noisy_valid_dir": se_dirs["valid"][0],
        "clean_valid_dir": se_dirs["valid"][1],
        "noisy_test_dir": se_dirs["test"][0],
        "clean_test_dir": se_dirs["test"][1],
        "train_bs": 2,
        "valid_bs": 2,
        "test_bs": 2,
        "lr": 1e-3,
        "nomad_weight": 0.001,
        "target_sr": 16000,
        "patience": 3,
        "num_epochs": 1,
        "test_every": 1,
        "n_layers": 3,
    }
    cfg.update(overrides)
    return cfg


def test_paired_dataset_fixed_window(se_dirs):
    from nomad_tpu.training.data import PairedAudioDataset

    ds = PairedAudioDataset(*se_dirs["train"])
    n, c = ds.load_item(0)
    assert n.shape == c.shape == (16384,)  # fixed crop (reference :196)
    batches = list(ds.batches(2, shuffle=False))
    assert batches[0][0].shape == (2, 16384)


def test_se_training_epoch(se_dirs, tiny_nomad):
    se = SpeechEnhancement(se_config(se_dirs), nomad=tiny_nomad)
    loss0 = se.train(seed=0)
    assert np.isfinite(loss0)
    val = se.eval()
    assert np.isfinite(val)
    res = se.test()
    assert res["metric"] in ("pesq_wb", "si_sdr_db")
    assert np.isfinite(res["value"])


def test_se_nomad_loss_contributes_grad(se_dirs, tiny_nomad):
    """The NOMAD term must contribute nonzero gradient to the U-Net (the
    whole point of BASELINE config 3)."""
    import jax
    import jax.numpy as jnp

    se_a = SpeechEnhancement(se_config(se_dirs, nomad_weight=0.0), nomad=tiny_nomad)
    se_b = SpeechEnhancement(se_config(se_dirs, nomad_weight=10.0), nomad=tiny_nomad)
    noisy, clean = next(se_a.train_set.batches(2, shuffle=False))

    def gradnorm(se):
        def loss(p):
            l, _ = se._loss(p, se.batch_stats, se.nomad.params,
                            jnp.asarray(noisy), jnp.asarray(clean),
                            jax.random.key(0))
            return l

        g = jax.grad(loss)(se.params)
        return float(
            sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))
        )

    ga = gradnorm(se_a)
    gb = gradnorm(se_b)
    assert np.isfinite(ga) and np.isfinite(gb)
    assert abs(ga - gb) > 1e-6  # NOMAD term changes the gradient


def test_se_checkpoint_roundtrip(se_dirs, tiny_nomad, tmp_path):
    se = SpeechEnhancement(se_config(se_dirs), nomad=tiny_nomad)
    p = str(tmp_path / "se.npz")
    se.save(p)
    se2 = SpeechEnhancement(se_config(se_dirs), nomad=tiny_nomad)
    se2.load(p)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(se.params),
        jax.tree_util.tree_leaves(se2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_si_sdr_sanity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    assert si_sdr(x, x) > 60  # perfect reconstruction
    assert si_sdr(x + 0.1 * rng.standard_normal((2, 1000)).astype(np.float32), x) < 30
