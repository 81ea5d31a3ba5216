"""Large-scale sharded scoring on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.distance import cdist as scipy_cdist

from nomad_tpu.models import NomadModel, Wav2Vec2Config
from nomad_tpu.scoring.large_scale import make_large_scale_scorer


@pytest.fixture(scope="module")
def scorer():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    return make_large_scale_scorer(model, params)


def test_sharded_matches_dense_with_ragged_sizes(scorer, rng):
    # sizes NOT multiples of the mesh dims: exercises padding + masked mean
    deg = rng.standard_normal((37, 16)).astype(np.float32)
    nmr = rng.standard_normal((13, 16)).astype(np.float32)
    deg /= np.linalg.norm(deg, axis=1, keepdims=True)
    nmr /= np.linalg.norm(nmr, axis=1, keepdims=True)
    avg, dm = scorer.score_embeddings(deg, nmr)
    ref = scipy_cdist(deg, nmr)
    assert dm.shape == (37, 13)
    np.testing.assert_allclose(dm, ref, atol=1e-4)
    np.testing.assert_allclose(avg, ref.mean(axis=1), atol=1e-4)


def test_end_to_end_waves(scorer, rng):
    waves = [
        (0.2 * rng.standard_normal(n)).astype(np.float32)
        for n in rng.integers(700, 1500, size=19)
    ]
    deg_emb = scorer.engine.embed_waves(waves[:12])
    nmr_emb = scorer.engine.embed_waves(waves[12:])
    avg, dm = scorer.score_embeddings(deg_emb, nmr_emb)
    assert dm.shape == (12, 7)
    assert np.all(np.isfinite(dm))
    assert np.all(dm >= 0) and np.all(dm <= 2.0 + 1e-5)
