"""End-to-end triplet training on a tiny model + synthetic dataset
(reference semantics: `/root/reference/src/training/train_triplet.py`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from nomad_tpu.io import write_wav
from nomad_tpu.models import NomadModel, Wav2Vec2Config
from nomad_tpu.training import (
    Training,
    TripletDataset,
    TripletLoader,
    param_labels,
    triplet_margin_loss,
)


@pytest.fixture(scope="module")
def triplet_tree(tmp_path_factory):
    """Synthetic degraded-librispeech-like tree + train/valid csvs."""
    root = tmp_path_factory.mktemp("degraded")
    rng = np.random.default_rng(0)
    rows = []
    for kind in ("OPUS", "MP3", "NOISE", "CLEAN"):
        os.makedirs(root / kind, exist_ok=True)
    for i in range(6):
        for kind in ("OPUS", "MP3", "NOISE", "CLEAN"):
            w = (0.2 * rng.standard_normal(900 + 100 * (i % 3))).astype(np.float32)
            write_wav(str(root / kind / f"f{i}.wav"), w[None], 16000, bits=16)
        rows.append(
            {
                "db": 1 + (i % 2),
                "Anchor": f"OPUS/f{i}.wav",
                "Positive": f"MP3/f{i}.wav",
                "Negative": f"NOISE/f{i}.wav",
                "anc_pos_dist": 0.01,
                "anc_neg_dist": 0.3,
            }
        )
    df = pd.DataFrame(rows)
    train_csv = root / "train.csv"
    valid_csv = root / "valid.csv"
    df.to_csv(train_csv, index=False)
    df.to_csv(valid_csv, index=False)
    return str(root) + "/", str(train_csv), str(valid_csv)


def make_config(triplet_tree, **overrides):
    root, train_csv, valid_csv = triplet_tree
    cfg = {
        "experiment_name": "Training",
        "out_dir": "train-triplet-test",
        "root": root,
        "train_df": train_csv,
        "valid_df": valid_csv,
        "train_bs": 2,
        "val_bs": 2,
        "lr": 1e-3,
        "lr_decay_factor": 0.5,
        "lr_decay_step": 1,
        "num_epochs": 2,
        "num_workers": 2,
        "emb_dim": 16,
        "patience": 5,
        "margin": 0.2,
        "freeze_convnet": True,
        "freeze_all": False,
        "current_level": [1, 2],
        "trim": True,
        "eval_w2v": False,
        "masked_pool": True,
    }
    cfg.update(overrides)
    return cfg


def test_dataset_level_filter_and_paths(triplet_tree):
    cfg = make_config(triplet_tree)
    ds_all = TripletDataset(cfg, "train_df", level=[1, 2])
    ds_easy = TripletDataset(cfg, "train_df", level=[1])
    assert len(ds_easy) < len(ds_all)
    a, p, n = ds_all.item_paths(0)
    assert a.endswith("OPUS/f0.wav") and os.path.isfile(a)
    wa, wp, wn = ds_all.load_item(0)
    assert wa.dtype == np.float32 and wa.ndim == 1


def test_loader_shapes_and_bucketing(triplet_tree):
    cfg = make_config(triplet_tree)
    ds = TripletDataset(cfg, "train_df", level=[1, 2])
    loader = TripletLoader(ds, batch_size=2, shuffle=True, num_threads=2)
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        assert b.anchor.shape == b.positive.shape == b.negative.shape
        assert b.anchor.shape[1] >= b.lengths_a.max()
        assert b.anchor.shape[1] % 4096 == 0  # bucketed


def test_collate_int16_transfer_path(triplet_tree):
    """PCM16-sourced waves collate to int16 batches (half the wire bytes);
    off-grid floats keep f32; the jitted steps dequantize exactly so both
    dtypes give the same loss."""
    from nomad_tpu.training.data import collate_triplets

    cfg = make_config(triplet_tree)
    ds = TripletDataset(cfg, "train_df", level=[1, 2])
    items = [ds.load_item(i) for i in range(2)]
    b = collate_triplets(items)
    assert b.anchor.dtype == np.int16  # wavs were written as PCM16

    rng = np.random.default_rng(0)
    off = [(tuple(0.1 * rng.standard_normal(700).astype(np.float32)
                  for _ in range(3))) for _ in range(2)]
    b2 = collate_triplets(off)
    assert b2.anchor.dtype == np.float32

    # loss parity int16 vs f32 through the jitted eval step
    tr = Training(
        {"experiment_name": "none", "margin": 0.2, "emb_dim": 16,
         "masked_pool": True, "model_size": "tiny"},
    )
    tr.margin = 0.2
    f_i16 = tr._get_eval_step(b.anchor.shape, True)
    f_f32 = tr._get_eval_step(b.anchor.shape, False)
    args = (jnp.asarray(b.lengths_a), jnp.asarray(b.lengths_p),
            jnp.asarray(b.lengths_n))
    l_i16 = float(f_i16(tr.params, jnp.asarray(b.anchor),
                        jnp.asarray(b.positive), jnp.asarray(b.negative),
                        *args))
    dq = lambda x: jnp.asarray(x.astype(np.float32) / 32768.0)
    l_f32 = float(f_f32(tr.params, dq(b.anchor), dq(b.positive),
                        dq(b.negative), *args))
    assert abs(l_i16 - l_f32) < 1e-6


def test_param_labels_freeze_policy():
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    labels = param_labels(params["params"], freeze_convnet=True, freeze_all=False)
    assert labels["embedding"]["kernel"] == "head"
    assert labels["lossnet_embedding"]["kernel"] == "frozen"
    assert labels["backbone"]["feature_encoder"]["conv_0"]["kernel"] == "frozen"
    assert (
        labels["backbone"]["encoder"]["layers"]["layer"]["q_proj"]["kernel"]
        == "backbone"
    )
    # freeze_all: transformer frozen, but post_extract_proj stays trainable
    # (fairseq hangs it off the model root, not encoder)
    labels2 = param_labels(params["params"], freeze_convnet=True, freeze_all=True)
    assert labels2["backbone"]["encoder"]["layers"]["layer"]["q_proj"]["kernel"] == "frozen"
    assert labels2["backbone"]["post_extract_proj"]["kernel"] == "backbone"


def test_triplet_margin_loss_matches_torch(rng):
    import torch

    a, p, n = (rng.standard_normal((4, 16)).astype(np.float32) for _ in range(3))
    ours = float(triplet_margin_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)))
    theirs = float(
        torch.nn.TripletMarginLoss(margin=0.2)(
            torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n)
        )
    )
    assert abs(ours - theirs) < 1e-5


def test_training_epoch_updates_only_unfrozen(triplet_tree):
    cfg = make_config(triplet_tree)
    tiny = Wav2Vec2Config.tiny()
    tr = Training(cfg, model_config=tiny)
    before = jax.device_get(tr.params)
    train_loss = tr.train(rng_seed=0)
    assert np.isfinite(train_loss)
    after = jax.device_get(tr.params)

    conv_b = before["params"]["backbone"]["feature_encoder"]["conv_0"]["kernel"]
    conv_a = after["params"]["backbone"]["feature_encoder"]["conv_0"]["kernel"]
    np.testing.assert_array_equal(conv_a, conv_b)  # frozen
    head_b = before["params"]["embedding"]["kernel"]
    head_a = after["params"]["embedding"]["kernel"]
    assert np.max(np.abs(head_a - head_b)) > 0  # trained
    q_b = before["params"]["backbone"]["encoder"]["layers"]["layer"]["q_proj"]["kernel"]
    q_a = after["params"]["backbone"]["encoder"]["layers"]["layer"]["q_proj"]["kernel"]
    assert np.max(np.abs(q_a - q_b)) > 0  # backbone group trained

    valid_loss = tr.eval()
    assert np.isfinite(valid_loss)


@pytest.mark.parametrize("prec", ["fast", "fast_bf16"])
def test_training_mixed_precision_trajectory(triplet_tree, prec):
    """precision='fast'/'fast_bf16' must train: loss finite and the epoch
    trajectory close to the 'exact' recipe (loose tolerance — bf16 matmuls
    and activations round, but gradient descent must land in the same
    place on a tiny problem)."""
    cfg = make_config(triplet_tree, model_size="tiny")
    exact = Training(dict(cfg, precision="exact"))
    mixed = Training(dict(cfg, precision=prec))
    assert mixed.model_config.encoder_prec == "default"
    if prec == "fast_bf16":
        assert mixed.model_config.block_dtype == jnp.bfloat16

    l_exact = exact.train(rng_seed=0)
    l_mixed = mixed.train(rng_seed=0)
    assert np.isfinite(l_mixed)
    assert abs(l_mixed - l_exact) < 0.05  # same trajectory to bf16 noise

    # eval path too
    assert np.isfinite(mixed.eval())


def test_training_unknown_precision_rejected(triplet_tree):
    cfg = make_config(triplet_tree, model_size="tiny", precision="quantum")
    with pytest.raises(ValueError, match="unknown training precision"):
        Training(cfg)


def test_training_loop_checkpoints_and_lr_decay(triplet_tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = make_config(triplet_tree, num_epochs=2, lr_decay_step=1)
    tr = Training(cfg, model_config=Wav2Vec2Config.tiny())
    lr0 = tr.lr_head
    tr.training_loop()
    assert os.path.isfile(os.path.join(tr.PATH_DIR, "best_model.npz"))
    assert os.path.isfile(os.path.join(tr.PATH_DIR, "config.yaml"))
    assert os.path.isdir(os.path.join(tr.PATH_DIR, "checkpoints"))
    # Q10: with lr_decay_step=1 the decay fires every epoch regardless of
    # improvement ((counter+1) % 1 == 0)
    assert tr.lr_head == pytest.approx(lr0 * cfg["lr_decay_factor"] ** 2)


def test_checkpoint_roundtrip(triplet_tree, tmp_path):
    cfg = make_config(triplet_tree)
    tr = Training(cfg, model_config=Wav2Vec2Config.tiny())
    path = str(tmp_path / "ckpt.npz")
    tr.save_checkpoint(path)
    before = jax.device_get(tr.params)
    tr.load_checkpoint(path)
    after = jax.device_get(tr.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
