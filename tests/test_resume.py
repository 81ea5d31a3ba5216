"""Training resume across process restarts (upgrade over the reference,
which loses everything on crash — SURVEY §5.3/5.4)."""

import os

import numpy as np
import pytest

from nomad_tpu.models import Wav2Vec2Config
from nomad_tpu.training import Training

from test_training import make_config  # reuse the synthetic triplet tree


@pytest.fixture(scope="module")
def triplet_tree(tmp_path_factory):
    import test_training as tt

    return tt.triplet_tree.__wrapped__(tmp_path_factory)


def test_resume_restores_counters_and_opt_state(triplet_tree, tmp_path):
    run_dir = str(tmp_path / "run")
    cfg = make_config(
        triplet_tree, num_epochs=1, run_dir=run_dir, resume=True, patience=10
    )
    tr1 = Training(cfg, model_config=Wav2Vec2Config.tiny())
    tr1.training_loop()
    assert os.path.isdir(os.path.join(run_dir, "checkpoints"))

    # fresh process-equivalent: new Training from the same config resumes
    tr2 = Training(dict(cfg, num_epochs=2), model_config=Wav2Vec2Config.tiny())
    state = tr2._load_resume_state()
    assert state is not None
    best, counter, next_epoch = state
    assert next_epoch == 1
    assert np.isfinite(best)

    # adam moments restored (nonzero after an epoch of updates)
    import jax

    leaves = jax.tree_util.tree_leaves(tr2.opt_state)
    assert any(np.any(np.asarray(l) != 0) for l in leaves if hasattr(l, "shape"))

    # params differ from a fresh init (training happened)
    tr3 = Training(dict(cfg, resume=False), model_config=Wav2Vec2Config.tiny())
    a = np.asarray(
        jax.device_get(tr2.params["params"]["embedding"]["kernel"])
    )
    b = np.asarray(
        jax.device_get(tr3.params["params"]["embedding"]["kernel"])
    )
    assert np.max(np.abs(a - b)) > 0


def test_resume_continues_loop(triplet_tree, tmp_path):
    run_dir = str(tmp_path / "run2")
    cfg = make_config(
        triplet_tree, num_epochs=1, run_dir=run_dir, resume=True, patience=10
    )
    Training(cfg, model_config=Wav2Vec2Config.tiny()).training_loop()
    # second launch: starts at epoch 1, runs one more epoch
    tr = Training(dict(cfg, num_epochs=2), model_config=Wav2Vec2Config.tiny())
    tr.training_loop()
    from nomad_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    assert mgr.latest_step() == 1  # epoch index advanced
