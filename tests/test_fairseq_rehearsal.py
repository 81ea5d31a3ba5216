"""End-to-end conversion-day rehearsal (VERDICT r1 item 7).

Synthesizes fairseq-*named* checkpoint files on disk (the exact key layout
of wav2vec_small.pt / nomad_best_model.pt, reference `nomad.py:58-68`) and
runs them through the full production path: ``Nomad(weights_dir=...)`` ->
``_resolve_params`` -> canonicalize -> to_flax_params -> merge_into -> npz
cache -> engine scoring — comparing scores with the torch oracle loaded
from the same weights."""

import numpy as np
import pytest

from nomad_tpu.convert.fairseq_synth import (
    write_fairseq_checkpoint,
    write_nomad_checkpoint,
)
from nomad_tpu.convert.oracle import TorchNomadOracle
from nomad_tpu.models import Wav2Vec2Config

EMB = 16


@pytest.fixture(scope="module")
def oracle():
    return TorchNomadOracle(Wav2Vec2Config.tiny(), emb_dim=EMB, seed=3)


def _waves(rng, n=3):
    return [
        (0.1 * rng.standard_normal(ln)).astype(np.float32)
        for ln in (9000, 7200, 11000)[:n]
    ]


def test_nomad_checkpoint_end_to_end(oracle, tmp_path):
    from nomad_tpu.api import CACHE_FILENAME, Nomad

    wdir = tmp_path / "pt-models"
    wdir.mkdir()
    write_nomad_checkpoint(oracle, str(wdir / "nomad_best_model.pt"))

    cfg = Wav2Vec2Config.tiny()
    nomad = Nomad(config=cfg, emb_dim=EMB, weights_dir=str(wdir))
    rng = np.random.default_rng(0)
    waves = _waves(rng)

    got = nomad.engine.embed_waves(waves)
    want = oracle.embed_files(waves)
    np.testing.assert_allclose(got, want, atol=2e-4)

    # conversion must have produced the npz cache; a fresh Nomad must load
    # from it bit-identically
    assert (wdir / CACHE_FILENAME).is_file()
    nomad2 = Nomad(config=cfg, emb_dim=EMB, weights_dir=str(wdir))
    got2 = nomad2.engine.embed_waves(waves)
    np.testing.assert_array_equal(got, got2)


def test_nomad_checkpoint_predict_scores(oracle, tmp_path):
    """Full predict() on wav files written to disk: the distance matrix must
    match the oracle's batch-1 pipeline."""
    from scipy.spatial.distance import cdist as scipy_cdist

    from nomad_tpu.api import Nomad
    from nomad_tpu.io import write_wav

    wdir = tmp_path / "pt-models"
    wdir.mkdir()
    write_nomad_checkpoint(oracle, str(wdir / "nomad_best_model.pt"))

    rng = np.random.default_rng(1)
    deg_dir = tmp_path / "deg"
    nmr_dir = tmp_path / "nmr"
    deg_dir.mkdir()
    nmr_dir.mkdir()
    deg, nmr = _waves(rng, 2), _waves(rng, 2)
    for i, w in enumerate(deg):
        write_wav(str(deg_dir / f"d{i}.wav"), w[None], 16000, bits=16)
    for i, w in enumerate(nmr):
        write_wav(str(nmr_dir / f"n{i}.wav"), w[None], 16000, bits=16)

    nomad = Nomad(
        config=Wav2Vec2Config.tiny(), emb_dim=EMB, weights_dir=str(wdir)
    )
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    df_avg, df_dm = nomad.predict("dir", str(nmr_dir), str(deg_dir), str(out_dir))

    # oracle pipeline on the decoded PCM16 values
    from nomad_tpu.io import load_for_scoring

    deg_paths = sorted(str(deg_dir / f) for f in ("d0.wav", "d1.wav"))
    nmr_paths = sorted(str(nmr_dir / f) for f in ("n0.wav", "n1.wav"))
    def _dec(p):
        w = load_for_scoring(p)
        return w.astype(np.float32) / 32768.0 if w.dtype == np.int16 else w

    deg_dec = [_dec(p) for p in deg_paths]
    nmr_dec = [_dec(p) for p in nmr_paths]
    dm_want = scipy_cdist(oracle.embed_files(deg_dec), oracle.embed_files(nmr_dec))

    # df_dm: index = test-file stems, columns = nmr stems, rounded to 3
    got = df_dm.loc[["d0", "d1"], ["n0", "n1"]].to_numpy(float)
    np.testing.assert_allclose(got, dm_want, atol=1.5e-3)  # 3-decimal rounding


def test_w2v_only_checkpoint_warns_and_loads_backbone(oracle, tmp_path):
    from nomad_tpu.api import Nomad

    wdir = tmp_path / "pt-models"
    wdir.mkdir()
    write_fairseq_checkpoint(oracle, str(wdir / "wav2vec_small.pt"))

    # params resolve lazily (construction is cheap by design); the warning
    # fires on first access, when the checkpoint is actually converted
    nomad = Nomad(config=Wav2Vec2Config.tiny(), emb_dim=EMB, weights_dir=str(wdir))
    with pytest.warns(UserWarning, match="scoring head"):
        nomad.params

    # the backbone weights must still be the fairseq ones: raw mean-pooled
    # features (Origw2v path, no head involved) match the oracle backbone
    rng = np.random.default_rng(2)
    w = _waves(rng, 1)[0]
    import jax.numpy as jnp

    feats = np.asarray(
        nomad.model.apply(
            nomad.params, jnp.asarray(w[None]),
            method=type(nomad.model).forward_features,
        )
    )
    final, _ = oracle.backbone_outputs(w[None])
    np.testing.assert_allclose(feats, final.mean(axis=1), atol=2e-4)
